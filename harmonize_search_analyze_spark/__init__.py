"""harmonize_search_analyze_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference app
``amazon-archives/harmonize-search-analyze`` (a Spark-ETL + Elasticsearch +
Kibana crime-data explorer) as a single idiomatic PySpark engine:

- **harmonize**: the ETL operator library (rename/sanitize/value-map/cast,
  datetime + geolocation derivation, transform lineage).
- **profiler**: single-pass per-column statistics producing the "data
  dictionary" table (the schema-as-data contract the reference UI consumes).
- **catalog**: dataset registry with Elasticsearch-style wildcard index
  patterns resolved to ``unionByName(allowMissingColumns=True)``.
- **plans.compiler**: the search-predicate language (the ES bool-query DSL
  subset the reference webapp generates) compiled to ``pyspark.sql.Column``.
- **operators.aggregations**: the dashboard aggregation layer (count, terms
  top-k, nested terms, geohash grid, typeahead suggestions).
- **operators.{dedup,similarity,text}**: large-scale training-data-pipeline
  extensions (exact/MinHash-LSH/SimHash dedup, ANN search, text analysis).

Everything is DataFrame/Catalyst-native; the only custom scalar function is
geohash encoding, built as a pure Column expression (no Python UDF).
"""

from harmonize_search_analyze_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
