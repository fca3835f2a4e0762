from harmonize_search_analyze_spark.sources.catalog import Catalog

__all__ = ["Catalog"]
