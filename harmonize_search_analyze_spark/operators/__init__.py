from harmonize_search_analyze_spark.operators.aggregations import (
    count_metric,
    geohash_grid,
    nested_terms,
    suggest,
    terms,
)
from harmonize_search_analyze_spark.operators.profiler import build_data_dict

__all__ = [
    "build_data_dict",
    "count_metric",
    "geohash_grid",
    "nested_terms",
    "suggest",
    "terms",
]
