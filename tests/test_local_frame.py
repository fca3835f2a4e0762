"""local_frame (sources/tables.py): the JVM-LocalRelation fast path for
small driver-assembled frames must be value- and wire-type-identical to
spark.createDataFrame, and must fall back to createDataFrame whenever the
input is empty, oversized, or uses non-atomic cell types."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from harmonize_search_analyze_spark.sources.tables import (
    _LOCAL_FRAME_MAX_PARAMS,
    local_frame,
)


def _same(spark, rows, schema):
    a = local_frame(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.dtypes == b.dtypes, (a.dtypes, b.dtypes)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    return a


def test_ddl_schema_identity(spark):
    _same(
        spark,
        [(0, "a", 1.5, 10), (1, "b", -2.25, 20)],
        "rank INT, piece STRING, logprob DOUBLE, total BIGINT",
    )


def test_name_list_schema_identity(spark):
    _same(spark, [(0, "en"), (1, "fr")], ["pos", "token"])


def test_struct_type_schema_identity(spark):
    schema = T.StructType([
        T.StructField("dict_field", T.StringType()),
        T.StructField("dict_vartype", T.StringType()),
    ])
    _same(spark, [("a", "Continuous"), ("b", "Class")], schema)


def test_string_escaping_and_nulls(spark):
    rows = [
        ("it's", None),
        ('say "hi"\nnewline\ttab', 1),
        ("back\\slash ; -- comment :p0 ${x}", 2),
    ]
    _same(spark, rows, "s STRING, n BIGINT")


def test_bool_and_temporal_cells(spark):
    rows = [
        (True, datetime.date(2020, 2, 29),
         datetime.datetime(2021, 3, 4, 5, 6, 7, 250000)),
        (False, None, None),
    ]
    _same(spark, rows, "b BOOLEAN, d DATE, ts TIMESTAMP")


def test_fast_path_is_local_relation(spark):
    df = local_frame(spark, [(1, "x")], "i INT, s STRING")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan
    assert "Scan ExistingRDD" not in plan


def test_fallback_on_empty_rows(spark):
    df = local_frame(spark, [], "i INT, s STRING")
    assert df.dtypes == [("i", "int"), ("s", "string")]
    assert df.count() == 0


def test_fallback_on_array_cells(spark):
    rows = [(0, [1.0, 2.0])]
    df = local_frame(spark, rows, "centroid_id INT, cvec ARRAY<DOUBLE>")
    assert [tuple(r) for r in df.collect()] == [(0, [1.0, 2.0])]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan  # took the createDataFrame path


def test_fallback_on_param_overflow(spark):
    n_rows = _LOCAL_FRAME_MAX_PARAMS // 2 + 1  # 2 cols -> just over the cap
    rows = [(i, f"s{i}") for i in range(n_rows)]
    df = local_frame(spark, rows, "i BIGINT, s STRING")
    assert df.count() == n_rows
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan


def test_generator_rows_materialize_once(spark):
    df = local_frame(spark, ((i, f"s{i}") for i in range(3)), ["i", "s"])
    assert sorted(map(tuple, df.collect())) == [(0, "s0"), (1, "s1"), (2, "s2")]


def test_bare_atomic_ddl_falls_back(spark):
    a = local_frame(spark, [1, 2], "long")
    b = spark.createDataFrame([1, 2], "long")
    assert a.dtypes == b.dtypes
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_type_mismatch_not_silently_coerced(spark):
    # createDataFrame rejects a stringified number into BIGINT; the
    # drop-in must surface the SAME error, not CAST-coerce it
    import pytest
    from pyspark.errors import PySparkTypeError

    with pytest.raises(PySparkTypeError):
        spark.createDataFrame([("5",)], "n BIGINT")
    with pytest.raises(PySparkTypeError):
        local_frame(spark, [("5",)], "n BIGINT")


def test_bool_not_coerced_into_bigint(spark):
    import pytest
    from pyspark.errors import PySparkTypeError

    with pytest.raises(PySparkTypeError):
        spark.createDataFrame([(True,)], "n BIGINT")
    with pytest.raises(PySparkTypeError):
        local_frame(spark, [(True,)], "n BIGINT")


def test_empty_pairs_connected_components(spark):
    # regression: observe() SUM over an empty frame is NULL; the CC loop
    # must terminate immediately, not spin to max_iters and raise
    from harmonize_search_analyze_spark.operators.dedup import (
        connected_components,
    )

    empty = spark.createDataFrame([], "id1 long, id2 long")
    assert connected_components(empty).collect() == []


def test_name_list_mixed_column_falls_back(spark):
    # int + float in one column: the inference bails to createDataFrame,
    # which itself rejects the merge — the drop-in surfaces the SAME error
    import pytest
    from pyspark.errors import PySparkTypeError

    rows = [(1,), (2.5,)]
    with pytest.raises(PySparkTypeError):
        spark.createDataFrame(rows, ["x"])
    with pytest.raises(PySparkTypeError):
        local_frame(spark, rows, ["x"])
