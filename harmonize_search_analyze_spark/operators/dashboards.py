"""The reference's dashboard, declaratively.

``kibana-exported-visualizations.json`` ships five visualizations composed
into one dashboard (viz ids in parens), every panel sharing one filter
context (base ``query_string:*`` AND the webapp's bool query AND the global
time window — ``views.js:97-115``, ``config.js:31-32``):

1. "Description" pie (2): terms agg on ``description``, size 10
2. "Day/Hour" pie (3): nested terms ``dayofweek`` (10) -> ``hour`` (24)
3. "DatasetTable" (4): terms table ``city`` x ``notebookhtml``, size 20
4. "City" pie (5): terms agg on ``city``, size 10
5. "IncidentMap" (7): geohash_grid on ``geolocation``, precision 2

``crime_dashboard`` reproduces exactly that panel set over a harmonized
frame (the ``*harmonized*`` wildcard union). One filtered/cached frame, five
aggregations — the scatter/gather ES performs per panel collapses into
Spark's partial+final aggregation per panel over a shared scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.aggregations import (
    dashboard,
    geohash_grid,
    nested_terms,
    terms,
    terms_multi,
)
from harmonize_search_analyze_spark.plans.compiler import compile_query


def split_geolocation(
    df: DataFrame, geo_col: str = "geolocation",
    lat_col: str = "_lat", lon_col: str = "_lon",
) -> DataFrame:
    """Parse the harmonized ``"lat,lon"`` string back into numeric columns
    (the inverse of ``Harmonizer.derive_geolocation``; the reference relies
    on ES's geo_point parse of the same string)."""
    parts = F.split(F.col(geo_col), ",")
    return (
        df.withColumn(lat_col, parts.getItem(0).cast("double"))
        .withColumn(lon_col, parts.getItem(1).cast("double"))
    )


def crime_dashboard(
    frame: DataFrame,
    query_ast: dict[str, Any] | None = None,
    time_from=None,
    time_to=None,
    time_field: str = "datetime",
    geohash_precision: int = 2,
) -> dict[str, DataFrame]:
    """Run the reference's five panels over one shared filter context.

    ``query_ast`` is the ES-DSL bool query the webapp would emit; the time
    window is the Kibana global filter (defaults: unbounded, the reference
    uses now-20y..now). Returns panel name -> result DataFrame.
    """
    predicate = compile_query(query_ast) if query_ast else None
    panels = {
        "description_pie": lambda d: terms(d, "description", k=10),
        "day_hour_pie": lambda d: nested_terms(
            d, "dayofweek", "hour", outer_k=10, inner_k=24
        ),
        "dataset_table": lambda d: terms_multi(
            d, ["city", "notebookhtml"], k=20
        ),
        "city_pie": lambda d: terms(d, "city", k=10),
        "incident_map": lambda d: geohash_grid(
            split_geolocation(d), "_lat", "_lon", precision=geohash_precision
        ),
    }
    return dashboard(
        frame,
        panels,
        query=predicate,
        time_field=time_field if (time_from or time_to) else None,
        time_from=time_from,
        time_to=time_to,
    )


def dictionary_bootstrap(dict_union: DataFrame, limit: int = 1000) -> DataFrame:
    """§3.3: the UI-bootstrap metadata query — the exact projection the
    webapp fetches from ``*dictionary*`` (``collections.js:65-88``,
    size 1000) to build its filter widgets. Ordered by (group, field), the
    FieldCollection comparator (``collections.js:40-42``), so the limit is
    deterministic and the rows arrive UI-ready."""
    return (
        dict_union.select(
            "dict_field", "dict_vargroup", "dict_vartype", "dict_vardescr",
            "dict_min", "dict_max", "dict_countdistinct", "dict_uifilter",
        )
        .orderBy("dict_vargroup", "dict_field")
        .limit(limit)
    )


def vargroup_bootstrap(
    dict_union: DataFrame, group_col: str = "dict_vargroup"
) -> DataFrame:
    """The webapp's ``GroupCollection``: distinct variable groups sorted
    lexicographically (``collections.js:130-132`` — ``keys().sort()``; the
    ``NN.`` prefix exists exactly so this sort IS the display order), with
    the numeric ordering prefix stripped for display
    (``collections.js:17-27`` — ``/^\\d+\\.(.+)/``, which requires at least
    one character after the dot; a bare ``"12."`` stays as-is)."""
    return (
        dict_union.select(F.col(group_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .withColumn(
            "display_name",
            F.regexp_replace("name", r"^\d+\.(.+)", "$1"),
        )
        .orderBy("name")
    )
