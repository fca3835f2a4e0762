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
from harmonize_search_analyze_spark.operators.bloom import (
    bloom_build,
    bloom_dedup,
    bloom_merge,
)
from harmonize_search_analyze_spark.operators.dsir import (
    dsir_sample,
    dsir_weights,
)
from harmonize_search_analyze_spark.operators.joins import (
    has_child,
    has_parent,
)
from harmonize_search_analyze_spark.operators.profiler import build_data_dict
from harmonize_search_analyze_spark.operators.ranking import (
    distance_feature,
    rank_feature,
)

__all__ = [
    "distance_feature",
    "has_child",
    "has_parent",
    "rank_feature",
    "bloom_build",
    "bloom_dedup",
    "bloom_merge",
    "dsir_sample",
    "dsir_weights",
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
