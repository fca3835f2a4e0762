from harmonize_search_analyze_spark.functions.geohash import (
    geohash_encode,
    geohash_encode_sql,
)
from harmonize_search_analyze_spark.functions.tokenize import (
    phrase_prefix_predicate,
    phrase_prefix_regex,
    split_tokens,
)

__all__ = [
    "geohash_encode",
    "geohash_encode_sql",
    "phrase_prefix_predicate",
    "phrase_prefix_regex",
    "split_tokens",
]
