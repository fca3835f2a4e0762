"""Property-based profiler tests (SURVEY.md §5.5, hypothesis): on random
frames the dictionary invariants must hold —

- dict_count + dict_countmissing == total rows
- dict_countdistinct <= dict_count
- the type-guess CASE (A2) is total: every row gets a vartype
- numeric mean/stddev bounded by min/max; string columns get NULL mean
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harmonize_search_analyze_spark.operators.profiler import build_data_dict

_num = st.one_of(st.none(), st.integers(-1000, 1000))
_txt = st.one_of(st.none(), st.text(
    alphabet="abcXYZ 019_-", min_size=0, max_size=12))


@st.composite
def frames(draw):
    n = draw(st.integers(1, 25))
    nums = draw(st.lists(_num, min_size=n, max_size=n))
    txts = draw(st.lists(_txt, min_size=n, max_size=n))
    return list(zip(nums, txts))


@given(rows=frames())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_profiler_invariants(spark, rows):
    df = spark.createDataFrame(rows, schema="num int, txt string")
    d = {r["dict_field"]: r for r in build_data_dict(df).collect()}
    n = len(rows)
    assert set(d) == {"num", "txt"}
    for r in d.values():
        assert r["dict_count"] + r["dict_countmissing"] == n
        assert r["dict_countdistinct"] <= r["dict_count"]
        assert r["dict_countdistinct"] >= (1 if r["dict_count"] > 0 else 0)
        assert r["dict_vartype"]  # A2 CASE is total

    num = d["num"]
    non_null = [v for v, _ in rows if v is not None]
    if non_null:
        assert num["dict_mean"] is not None
        assert min(non_null) <= num["dict_mean"] <= max(non_null)
        assert math.isclose(
            num["dict_mean"], sum(non_null) / len(non_null), rel_tol=1e-9
        )
        assert float(num["dict_min"]) == min(non_null)
        assert float(num["dict_max"]) == max(non_null)
        # numeric columns resolve to boolean/range vartypes
        assert num["dict_vartype"].startswith(("boolean", "range,"))
    else:
        assert num["dict_mean"] is None

    txt = d["txt"]
    assert txt["dict_mean"] is None and txt["dict_stddev"] is None
    if txt["dict_count"] > 0:
        assert txt["dict_vartype"] == "text"


@given(rows=st.lists(st.booleans(), min_size=4, max_size=20))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_boolean_type_guess(spark, rows):
    # int 0/1 columns with both values present must resolve to 'boolean'
    rows = rows + [True, False]  # force both values
    df = spark.createDataFrame([(int(b),) for b in rows], schema="b int")
    d = {r["dict_field"]: r for r in build_data_dict(df).collect()}
    assert d["b"]["dict_vartype"] == "boolean"


def test_approx_distinct_mode(spark):
    df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
    d = {
        r["dict_field"]: r
        for r in build_data_dict(df, exact_distinct=False).collect()
    }
    # HLL estimate within 10% on a tiny cardinality
    assert abs(d["s"]["dict_countdistinct"] - 7) <= 1
    assert abs(d["id"]["dict_countdistinct"] - 1000) <= 100
