"""Round-9 post-queue-close additions (placed INSIDE the round-9 driver
window, slots 49-50, so they are externally verified the round they ship):

krippendorff_alpha (nominal inter-annotator agreement with missing data)
and neyman_allocation (variance-optimal stratified sample allocation) —
hand-computed references, degenerate-case pins, dual-dialect twin
equality on both engines.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest


def _ref_alpha(ratings):
    """Pure-python nominal Krippendorff alpha (textbook coincidence-matrix
    form) for the hand-computed comparisons."""
    by_u = defaultdict(list)
    for u, v in ratings:
        by_u[u].append(v)
    by_u = {u: vs for u, vs in by_u.items() if len(vs) >= 2}
    n = sum(len(vs) for vs in by_u.values())
    dnum = 0.0
    for vs in by_u.values():
        nu, cnt = len(vs), Counter(vs)
        dnum += (nu * nu - sum(c * c for c in cnt.values())) / (nu - 1)
    d_o = dnum / n
    pooled = Counter(v for vs in by_u.values() for v in vs)
    d_e = (n * n - sum(c * c for c in pooled.values())) / (n * (n - 1))
    return len(by_u), n, d_o, d_e, 1.0 - d_o / d_e


# -- krippendorff_alpha -------------------------------------------------------


def test_krippendorff_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        krippendorff_alpha,
    )

    ratings = [
        ("u1", "a"), ("u1", "a"), ("u1", "b"),
        ("u2", "b"), ("u2", "b"),
        ("u3", "a"), ("u3", "b"), ("u3", "b"), ("u3", "b"),
        ("u4", "a"),               # singleton: unpairable, must drop
        ("u5", None),              # NULL value: drops
        (None, "a"),               # NULL unit: drops
    ]
    n_units, n, d_o, d_e, alpha = _ref_alpha(
        [(u, v) for u, v in ratings if u is not None and v is not None]
    )
    df = spark.createDataFrame(ratings, "u string, v string")
    r = krippendorff_alpha(df, "u", "v").collect()[0]
    assert (r.n_units, r.n_ratings) == (n_units, n) == (3, 9)
    assert r.d_o == pytest.approx(round(d_o, 6))
    assert r.d_e == pytest.approx(round(d_e, 6))
    assert r.alpha == pytest.approx(round(alpha, 6))


def test_krippendorff_perfect_and_degenerate(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        krippendorff_alpha,
    )

    # perfect agreement across two values -> d_o = 0, alpha = 1
    perfect = spark.createDataFrame(
        [("u1", "a")] * 3 + [("u2", "b")] * 3, "u string, v string"
    )
    r = krippendorff_alpha(perfect, "u", "v").collect()[0]
    assert r.d_o == 0.0 and r.alpha == 1.0
    # single pooled value -> d_e = 0 -> alpha NULL (vacuous agreement)
    vacuous = spark.createDataFrame(
        [("u1", "a")] * 2 + [("u2", "a")] * 2, "u string, v string"
    )
    r = krippendorff_alpha(vacuous, "u", "v").collect()[0]
    assert r.d_e == 0.0 and r.alpha is None
    # nothing pairable -> NULLs, never a crash
    empty = spark.createDataFrame(
        [("u1", "a"), ("u2", "b")], "u string, v string"
    )
    r = krippendorff_alpha(empty, "u", "v").collect()[0]
    assert r.n_units == 0 and r.alpha is None


def test_krippendorff_sql_twin_both_dialects(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        krippendorff_alpha,
        krippendorff_alpha_sql,
    )

    rows = [(f"u{i % 37}", f"v{(i * 7 + i % 5) % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "u string, v string")
    want = tuple(krippendorff_alpha(df, "u", "v").collect()[0])
    df.createOrReplaceTempView("s12_ka")
    got = tuple(spark.sql(
        krippendorff_alpha_sql("s12_ka", "u", "v", "spark")
    ).collect()[0])
    assert want == got
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        krippendorff_alpha_sql("t", "u", "v", "duckdb")
    ).fetchall()[0]
    assert tuple(duck) == pytest.approx(want)


# -- neyman_allocation --------------------------------------------------------


def test_neyman_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        neyman_allocation,
    )

    data = {
        "a": [1.0, 2.0, 3.0, 4.0],           # sd_pop = sqrt(1.25)
        "b": [10.0, 10.0, 10.0],             # constant -> share 0
        "c": [0.0, 100.0],                   # sd_pop = 50
    }
    rows = [(h, x) for h, xs in data.items() for x in xs]
    df = spark.createDataFrame(rows, "h string, x double")
    out = {r.stratum: r for r in
           neyman_allocation(df, "h", "x", budget=100).collect()}
    den = sum(len(xs) * float(np.std(xs)) for xs in data.values())
    for h, xs in data.items():
        sd = float(np.std(xs))
        assert out[h].n_rows == len(xs)
        assert out[h].sd_pop == pytest.approx(round(sd, 6), abs=1e-6)
        assert out[h].neyman_share == pytest.approx(
            round(len(xs) * sd / den, 6), abs=1e-6)
        assert out[h].neyman_alloc == pytest.approx(
            round(100.0 * len(xs) * sd / den, 6), abs=1e-6)
        assert out[h].prop_alloc == pytest.approx(
            round(100.0 * len(xs) / 9, 6), abs=1e-6)
    assert out["b"].neyman_share == 0.0       # constant stratum
    # shares sum to 1, allocations to the budget
    assert sum(r.neyman_share for r in out.values()) == pytest.approx(1.0)
    assert sum(r.neyman_alloc for r in out.values()) == pytest.approx(100.0)


def test_neyman_degenerate_and_validation(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        neyman_allocation,
        neyman_allocation_sql,
    )

    # every stratum constant -> all shares NULL (nothing to allocate by)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0)], "h string, x double"
    )
    rows = neyman_allocation(df, "h", "x").collect()
    assert all(r.neyman_share is None for r in rows)
    assert [r.prop_alloc for r in rows] == [
        pytest.approx(1000 * 2 / 3, abs=1e-4),
        pytest.approx(1000 / 3, abs=1e-4),
    ]
    with pytest.raises(ValueError):
        neyman_allocation(df, "h", "x", budget=0)
    with pytest.raises(ValueError):
        neyman_allocation_sql("t", "h", "x", "duckdb", budget=-1)


def test_neyman_sql_twin_both_dialects(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        neyman_allocation,
        neyman_allocation_sql,
    )

    rows = [(f"s{i % 5}", float((i * 13 + i % 7) % 29) / 3.0)
            for i in range(300)]
    df = spark.createDataFrame(rows, "h string, x double")
    want = [tuple(r) for r in
            neyman_allocation(df, "h", "x", budget=250).collect()]
    df.createOrReplaceTempView("s12_ney")
    got = [tuple(r) for r in spark.sql(
        neyman_allocation_sql("s12_ney", "h", "x", "spark", budget=250)
    ).collect()]
    assert want == got
    con = duckdb.connect()
    con.execute("CREATE TABLE t (h VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.execute(
        neyman_allocation_sql("t", "h", "x", "duckdb", budget=250)
    ).fetchall()
    assert len(duck) == len(want)
    for a, b in zip(duck, want):
        assert a == pytest.approx(b)
