from harmonize_search_analyze_spark.operators.aggregations import (
    count_metric,
    geohash_grid,
    nested_terms,
    suggest,
    terms,
)
from harmonize_search_analyze_spark.operators.kibana import (
    dashboard_from_export,
    panels_from_export,
    parse_saved_objects,
)
from harmonize_search_analyze_spark.operators.profiler import build_data_dict

__all__ = [
    "build_data_dict",
    "dashboard_from_export",
    "panels_from_export",
    "parse_saved_objects",
    "count_metric",
    "geohash_grid",
    "nested_terms",
    "suggest",
    "terms",
]
