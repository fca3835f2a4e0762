from harmonize_search_analyze_spark.plans.compiler import compile_query, display_text

__all__ = ["compile_query", "display_text"]
