from harmonize_search_analyze_spark.plans.compiler import compile_query, display_text
from harmonize_search_analyze_spark.plans.esql import run_esql
from harmonize_search_analyze_spark.plans.kql import kql_query, parse_kql

__all__ = ["compile_query", "display_text", "kql_query", "parse_kql", "run_esql"]
