"""Round-8 additions: join_size_estimate (KMV optimizer statistic) and
embedding_health (vector-corpus quality audit) — hand-computed cases +
dual-dialect twin equality."""

from __future__ import annotations

import duckdb
import pytest


def _duck(con, name, rows, decl):
    con.execute(
        f"CREATE TABLE {name} AS SELECT * FROM (VALUES "
        + ",".join(rows)
        + f") t({decl})"
    )


# -- join_size_estimate ------------------------------------------------------


def test_join_size_estimate_hand_computed(spark):
    """A keys [1,1,2,3] (4 rows, 3 distinct), B keys [2,2,3,4,4,4]
    (6 rows, 3 distinct): sub-k sketches are exact, union = 4 keys,
    overlap = jaccard(2/4) * 4 = 2, est = 2 * (4/3) * (6/3) = 5.33."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
    )

    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3]], "k long")
    b = spark.createDataFrame(
        [(k,) for k in [2, 2, 3, 4, 4, 4]], "k long"
    )
    r = join_size_estimate(a, b, "k").collect()[0]
    assert (r.rows_a, r.rows_b) == (4, 6)
    assert (r.est_distinct_a, r.est_distinct_b) == (3.0, 3.0)
    assert r.est_key_overlap == pytest.approx(2.0)
    assert r.est_join_rows == pytest.approx(5.33)


def test_join_size_estimate_exact_under_uniform_multiplicity(spark):
    """Uniform multiplicities + sub-k sketches make the estimator
    EXACT: A = keys 0..4 twice each, B = keys 3..7 three times each,
    true join = 2 overlap keys {3,4} x 2 x 3 = 12 rows."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
    )

    a = spark.createDataFrame(
        [(k,) for k in range(5) for _ in range(2)], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in range(3, 8) for _ in range(3)], "k long"
    )
    r = join_size_estimate(a, b, "k").collect()[0]
    exact = a.join(b, "k").count()
    assert exact == 12
    assert r.est_join_rows == pytest.approx(float(exact))


def test_join_size_estimate_null_keys_and_empty_side(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
    )

    a = spark.createDataFrame([(1,), (None,)], "k long")
    b = spark.createDataFrame([], "k long")
    r = join_size_estimate(a, b, "k").collect()[0]
    assert (r.rows_a, r.rows_b) == (1, 0)  # null key excluded
    assert r.est_join_rows == 0.0
    with pytest.raises(ValueError, match="k must be"):
        join_size_estimate(a, b, "k", k=1)


def test_join_size_estimate_sql_twin_both_dialects(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
        join_size_estimate_sql,
    )

    rows_a = [(i % 37,) for i in range(300)]
    rows_b = [(i % 53 + 20,) for i in range(400)]
    a = spark.createDataFrame(rows_a, "k long")
    b = spark.createDataFrame(rows_b, "k long")
    # force the full-sketch (theta-estimator) path with a small k
    want = tuple(join_size_estimate(a, b, "k", k=16).collect()[0])
    a.createOrReplaceTempView("s11_jse_a")
    b.createOrReplaceTempView("s11_jse_b")
    got = tuple(
        spark.sql(
            join_size_estimate_sql("s11_jse_a", "s11_jse_b", "k",
                                   "spark", k=16)
        ).collect()[0]
    )
    assert want == got
    con = duckdb.connect()
    _duck(con, "ta", [f"({k})" for (k,) in rows_a], "k")
    _duck(con, "tb", [f"({k})" for (k,) in rows_b], "k")
    duck = con.execute(
        join_size_estimate_sql("ta", "tb", "k", "duckdb", k=16)
    ).fetchall()[0]
    assert tuple(duck) == pytest.approx(want)


# -- embedding_health ---------------------------------------------------------


def test_embedding_health_hand_computed(spark):
    """5 vectors: [3,4] (norm 5), [0,0] (zero norm), NULL, [NaN,1],
    [NULL,2] (NULL component — must land in n_nan, not silently escape
    every bucket; ADVICE r8) -> counts 5/1/2/1; healthy = the first
    two: dims 2/2, mean norm 2.5, median 2.5."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_health,
    )

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),
            (2, [0.0, 0.0]),
            (3, None),
            (4, [float("nan"), 1.0]),
            (5, [None, 2.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    r = embedding_health(df).collect()[0]
    assert (r.n_vectors, r.n_null_vec, r.n_nan, r.n_zero_norm) == (
        5, 1, 2, 1,
    )
    assert (r.min_dim, r.max_dim) == (2, 2)
    assert r.mean_norm == pytest.approx(2.5)
    assert r.p50_norm == pytest.approx(2.5)


def test_embedding_health_ragged_dims(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_health,
    )

    df = spark.createDataFrame(
        [(1, [1.0]), (2, [1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    r = embedding_health(df).collect()[0]
    assert (r.min_dim, r.max_dim) == (1, 3)
    assert r.n_nan == 0 and r.n_null_vec == 0


def test_embedding_health_sql_twin_both_dialects(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_health,
        embedding_health_sql,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) + 0.1 * j for j in range(4)])
        for i in range(60)
    ] + [
        (60, None),
        (61, [0.0, 0.0, 0.0, 0.0]),
        # NaN component + NULL component (ADVICE r8): exercises the
        # most dialect-divergent twin branch (Spark isnan/exists vs
        # DuckDB isnan/list_filter) against both defect classes.
        (62, [float("nan"), 1.0, 1.0, 1.0]),
        (63, [None, 2.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    want = tuple(embedding_health(df).collect()[0])
    assert want[2] == 2  # n_nan: the NaN row AND the NULL-component row
    df.createOrReplaceTempView("s11_eh")
    got = tuple(
        spark.sql(embedding_health_sql("s11_eh", "spark")).collect()[0]
    )
    assert want == got

    def _lit(x):
        if x is None:
            return "NULL"
        if x != x:  # NaN
            return "'NaN'::DOUBLE"
        return str(x)

    con = duckdb.connect()
    _duck(
        con, "emb",
        [
            "({},{})".format(
                i,
                "NULL" if v is None
                else "[" + ",".join(_lit(x) for x in v) + "]",
            )
            for i, v in rows
        ],
        "vec_id, embedding",
    )
    duck = con.execute(embedding_health_sql("emb", "duckdb")).fetchall()[0]
    assert tuple(duck) == pytest.approx(want)


@pytest.mark.slow
def test_join_size_estimate_property_uniform(spark):
    """Property (hypothesis-driven seeds, one spark session): for ANY
    key universe with globally uniform per-key multiplicity on each
    side and sub-k sketches, the estimate equals the exact join size
    |A cap B| * mult_a * mult_b."""
    from hypothesis import given, settings, strategies as st

    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        na=st.integers(2, 40),
        nb=st.integers(2, 40),
        off=st.integers(0, 30),
        ca=st.integers(1, 4),
        cb=st.integers(1, 4),
    )
    def check(na, nb, off, ca, cb):
        a_keys = set(range(na))
        b_keys = set(range(off, off + nb))
        a = spark.createDataFrame(
            [(k,) for k in a_keys for _ in range(ca)], "k long"
        )
        b = spark.createDataFrame(
            [(k,) for k in b_keys for _ in range(cb)], "k long"
        )
        r = join_size_estimate(a, b, "k").collect()[0]
        exact = len(a_keys & b_keys) * ca * cb
        assert r.est_join_rows == pytest.approx(float(exact), abs=0.02)

    check()
