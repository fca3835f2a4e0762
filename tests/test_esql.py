"""ES|QL pipe-language compiler: command coverage, plan shape, errors."""

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.plans.esql import ESQLError, run_esql
from harmonize_search_analyze_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark):
    c = Catalog(spark)
    c.register(
        "events-a",
        spark.createDataFrame(
            [
                (1, "click", 10.0, "u1"),
                (2, "view", 20.0, "u1"),
                (3, "click", 30.0, "u2"),
                (4, "buy", None, "u2"),
            ],
            ["id", "etype", "v", "user"],
        ),
    )
    c.register(
        "events-b",
        spark.createDataFrame([(5, "click", 50.0)], ["id", "etype", "v"]),
    )
    c.register(
        "users",
        spark.createDataFrame([("u1", "nl"), ("u2", "de")],
                              ["user", "country"]),
    )
    return c


def test_from_where_stats_by_sort_limit(cat):
    out = run_esql(cat, """
        FROM events-a
        | WHERE v IS NOT NULL
        | STATS n = count(*), total = sum(v) BY etype
        | SORT total DESC
        | LIMIT 2
    """)
    rows = [(r.etype, r.n, r.total) for r in out.collect()]
    assert rows == [("click", 2, 40.0), ("view", 1, 20.0)]


def test_from_wildcard_union_missing_columns(cat):
    out = run_esql(cat, "FROM events-* | STATS n = count(*)")
    assert out.collect()[0].n == 5
    # user column null-padded for events-b
    out2 = run_esql(cat, "FROM events-a, events-b | WHERE user IS NULL "
                         "| STATS n = count(*)")
    assert out2.collect()[0].n == 1


def test_eval_keep_drop_rename(cat):
    out = run_esql(cat, """
        FROM events-a
        | EVAL v2 = v * 2, tag = concat(etype, '!')
        | RENAME etype AS kind
        | KEEP id, kind, v2, tag
        | SORT id
        | LIMIT 1
    """)
    r = out.collect()[0]
    assert (r.id, r.kind, r.v2, r.tag) == (1, "click", 20.0, "click!")
    assert out.columns == ["id", "kind", "v2", "tag"]
    dropped = run_esql(cat, "FROM events-a | DROP v, user")
    assert dropped.columns == ["id", "etype"]


def test_keep_wildcard_order_and_unknown(cat):
    out = run_esql(cat, "FROM events-a | KEEP e*, id")
    assert out.columns == ["etype", "id"]
    with pytest.raises(ESQLError, match="matches no column"):
        run_esql(cat, "FROM events-a | KEEP z*")
    with pytest.raises(ESQLError, match="unknown column"):
        run_esql(cat, "FROM events-a | DROP nope")


def test_sort_null_semantics(cat):
    # ES|QL: nulls are larger than any value -> ASC last, DESC first
    asc = [r.id for r in run_esql(cat, "FROM events-a | SORT v").collect()]
    assert asc == [1, 2, 3, 4]
    desc = [r.id for r in
            run_esql(cat, "FROM events-a | SORT v DESC").collect()]
    assert desc == [4, 3, 2, 1]
    forced = [r.id for r in run_esql(
        cat, "FROM events-a | SORT v DESC NULLS LAST").collect()]
    assert forced == [3, 2, 1, 4]


def test_row_source_and_mv_expand(cat, spark):
    out = run_esql(None, "ROW a = 1, xs = array(10, 20)", spark=spark)
    r = out.collect()[0]
    assert r.a == 1 and list(r.xs) == [10, 20]
    exp = run_esql(None, "ROW a = 1, xs = array(10, 20) | MV_EXPAND xs",
                   spark=spark)
    assert [x.xs for x in exp.collect()] == [10, 20]


def test_lookup_join_broadcast(cat):
    out = run_esql(cat, """
        FROM events-a
        | LOOKUP JOIN users ON user
        | STATS n = count(*) BY country
        | SORT country
    """)
    assert [(r.country, r.n) for r in out.collect()] == [("de", 2), ("nl", 2)]
    plan = run_esql(
        cat, "FROM events-a | LOOKUP JOIN users ON user"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dissect_command(cat, spark):
    c = Catalog(spark)
    c.register("logs", spark.createDataFrame(
        [("alice 42",), ("bob 7",)], ["msg"]))
    out = run_esql(c, 'FROM logs | DISSECT msg "%{name} %{num}" '
                      "| WHERE cast(num AS int) > 10")
    assert [r.name for r in out.collect()] == ["alice"]


def test_where_pushdown_reaches_scan(cat, spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["id", "v"]
    ).write.parquet(p)
    c = Catalog(spark)
    c.register("ev", spark.read.parquet(p))
    plan = run_esql(c, "FROM ev | WHERE v >= 50 | KEEP id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(v,50" in plan
    # projection pruned to the two referenced columns
    assert "ReadSchema: struct<id:bigint,v:double>" in plan


def test_sort_limit_fuses_to_takeordered(cat):
    plan = run_esql(cat, "FROM events-a | SORT v DESC NULLS LAST | LIMIT 2") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_errors(cat, spark):
    with pytest.raises(ESQLError, match="start with FROM, ROW or TS"):
        run_esql(cat, "WHERE x > 1")
    with pytest.raises(ESQLError, match="first command"):
        run_esql(cat, "FROM events-a | FROM events-b")
    with pytest.raises(ESQLError, match="LIMIT needs an integer"):
        run_esql(cat, "FROM events-a | LIMIT ten")
    with pytest.raises(ESQLError, match="unsupported command"):
        run_esql(cat, "FROM events-a | FROBNICATE x")
    with pytest.raises(ESQLError, match="ENRICH"):
        run_esql(cat, "FROM events-a | ENRICH policy")
    with pytest.raises(ESQLError, match="at least one aggregate"):
        run_esql(cat, "FROM events-a | STATS BY etype")


def test_stats_by_expression_key(cat):
    out = run_esql(cat, """
        FROM events-a
        | STATS n = count(*) BY bucket = floor(coalesce(v, 0) / 20)
        | SORT bucket
    """)
    assert [(r.bucket, r.n) for r in out.collect()] == [(0, 2), (1, 2)]


def test_stats_filtered_aggregate(cat):
    out = run_esql(cat, """
        FROM events-a
        | STATS n = count(*), clicks = count(*) WHERE etype == 'click',
                big = count(*) WHERE coalesce(v, 0) >= 20 BY user
        | SORT user
    """)
    rows = [(r.user, r.n, r.clicks, r.big) for r in out.collect()]
    assert rows == [("u1", 2, 1, 1), ("u2", 2, 1, 1)]
    # still ONE aggregate: no union/self-join fork for the filtered aggs
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Union" not in final


def test_inlinestats_joins_back_onto_rows(cat):
    out = run_esql(cat, """
        FROM events-a
        | INLINESTATS avg_v = avg(v) BY etype
        | EVAL above = v > avg_v
        | SORT id
    """)
    rows = [(r.id, r.avg_v, r.above) for r in out.collect()]
    assert rows[0] == (1, 20.0, False) and rows[2] == (3, 20.0, True)
    assert len(rows) == 4  # rows preserved, not collapsed
    # the join-back is a BROADCAST of the bucket-sized agg, never a
    # shuffle join of the input against itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final or "BroadcastNestedLoop" in final
    assert "SortMergeJoin" not in final
    # composite agg expressions and filtered aggs evaluate in the agg
    # (a window-function encoding rejects both)
    comp = run_esql(cat, """
        FROM events-a
        | INLINESTATS r = round(avg(v), 1),
                      nc = count(*) WHERE etype == 'click' BY user
        | SORT id | LIMIT 1
    """).collect()[0]
    assert comp.r == 15.0 and comp.nc == 1
    # NULL group keys keep their aggregates (eqNullSafe join-back)
    nullkey = run_esql(cat, """
        FROM events-a
        | EVAL g = CASE WHEN id <= 2 THEN 'a' END
        | INLINESTATS n = count(*) BY g
        | SORT id
    """).collect()
    assert [r.n for r in nullkey] == [2, 2, 2, 2]


def test_concat_operator_not_split_as_pipes(cat):
    out = run_esql(
        cat, "FROM events-a | EVAL s = etype || '-' || user | SORT id "
             "| LIMIT 1"
    )
    assert out.collect()[0].s == "click-u1"
    # and in WHERE position (Spark SQL `||` is string concat)
    n = run_esql(
        cat, "FROM events-a | WHERE etype || user == 'clicku1' "
             "| STATS n = count(*)"
    ).collect()[0].n
    assert n == 1


def test_trailing_by_and_empty_where_rejected(cat):
    with pytest.raises(ESQLError, match="BY needs"):
        run_esql(cat, "FROM events-a | STATS n = count(*) BY")
    with pytest.raises(ESQLError, match="WHERE needs a condition"):
        run_esql(cat, "FROM events-a | STATS n = count(*) WHERE")
    with pytest.raises(ESQLError, match="SORT key"):
        run_esql(cat, "FROM events-a | SORT desc")


def test_lookup_join_shadows_colliding_columns(cat, spark):
    c = Catalog(spark)
    c.register("ev", spark.createDataFrame(
        [(1, "u1", "stale")], ["id", "user", "country"]))
    c.register("users", spark.createDataFrame(
        [("u1", "nl")], ["user", "country"]))
    out = run_esql(c, "FROM ev | LOOKUP JOIN users ON user | KEEP country")
    assert out.columns == ["country"]
    assert out.collect()[0].country == "nl"  # lookup value replaces input


def test_change_point_command(cat, spark):
    c = Catalog(spark)
    vals = [10.0] * 6 + [50.0] * 6
    c.register("series", spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["t", "v"]))
    out = run_esql(c, "FROM series | CHANGE_POINT v ON t")
    r = out.collect()[0]
    assert r.change_bucket == 6 and r.mean_before == 10.0
    with pytest.raises(ESQLError, match="CHANGE_POINT needs"):
        run_esql(cat, "FROM events-a | CHANGE_POINT v")


def test_pipe_in_string_literal_not_split(cat):
    out = run_esql(
        cat, "FROM events-a | EVAL s = concat(etype, '|', user) | SORT id "
             "| LIMIT 1"
    )
    assert out.collect()[0].s == "click|u1"


def test_stats_alias_with_dotted_by_segment_not_split(cat):
    """A dotted alias whose segment equals a keyword (``v.by``) is an
    identifier, not a BY split point."""
    out = run_esql(cat, "FROM events-a | STATS v.by = count(*) BY etype "
                        "| SORT etype")
    assert out.columns == ["etype", "v.by"]
    assert {r["etype"]: r["v.by"] for r in out.collect()} == {
        "buy": 1, "click": 2, "view": 1,
    }


def test_agg_where_not_split_inside_dotted_name(cat):
    out = run_esql(
        cat, "FROM events-a | STATS n.where = count(*) WHERE v > 15"
    )
    assert out.columns == ["n.where"]
    assert out.collect()[0]["n.where"] == 2


def test_rename_unknown_column_raises(cat):
    with pytest.raises(ESQLError, match="RENAME: unknown column"):
        run_esql(cat, "FROM events-a | RENAME nope AS x")


# -- round-4 additions: ENRICH / SAMPLE / FORK / function translation -------


def test_enrich_policy_join_and_with_rename(cat, spark):
    c = Catalog(spark)
    c.register("ev", spark.createDataFrame(
        [(1, "u1"), (2, "u2"), (3, "u3")], ["id", "user"]))
    c.register_enrich(
        "users-policy",
        spark.createDataFrame(
            [("u1", "nl", 10), ("u2", "de", 20)],
            ["user", "country", "score"],
        ),
        match_field="user",
    )
    out = run_esql(c, "FROM ev | ENRICH users-policy ON user | SORT id")
    rows = out.collect()
    assert out.columns == ["id", "user", "country", "score"]
    assert [r.country for r in rows] == ["nl", "de", None]  # left join
    # WITH subset + rename
    out2 = run_esql(
        c, "FROM ev | ENRICH users-policy ON user WITH geo = country "
           "| SORT id"
    )
    assert out2.columns == ["id", "user", "geo"]
    assert out2.collect()[0].geo == "nl"
    with pytest.raises(ESQLError, match="not an enrich field"):
        run_esql(c, "FROM ev | ENRICH users-policy ON user WITH nope")
    with pytest.raises(ESQLError, match="unknown policy"):
        run_esql(c, "FROM ev | ENRICH ghost ON user")


def test_enrich_shadows_existing_column(cat, spark):
    c = Catalog(spark)
    c.register("ev", spark.createDataFrame(
        [(1, "u1", "stale")], ["id", "user", "country"]))
    c.register_enrich(
        "p", spark.createDataFrame([("u1", "nl")], ["user", "country"]),
        match_field="user",
    )
    out = run_esql(c, "FROM ev | ENRICH p ON user")
    assert out.collect()[0].country == "nl"


def test_sample_filters_rows_and_validates(cat, spark):
    c = Catalog(spark)
    c.register("big", spark.range(2000).withColumnRenamed("id", "x"))
    n = run_esql(c, "FROM big | SAMPLE 0.25 42").count()
    assert 300 < n < 700  # Bernoulli around 500
    with pytest.raises(ESQLError, match="probability must be in"):
        run_esql(c, "FROM big | SAMPLE 1.5")
    with pytest.raises(ESQLError, match="seed must be an integer"):
        run_esql(c, "FROM big | SAMPLE 0.5 xyz")


def test_fork_unions_branches_with_discriminator(cat):
    out = run_esql(cat, """
        FROM events-a
        | FORK (WHERE etype == "click" | STATS n = count(*))
               (STATS total_v = round(sum(v), 2))
        | SORT _fork
    """)
    rows = out.collect()
    assert out.columns == ["n", "_fork", "total_v"]
    assert [r._fork for r in rows] == ["fork1", "fork2"]
    assert rows[0].n == 2 and rows[0].total_v is None
    assert rows[1].total_v == 60.0 and rows[1].n is None
    with pytest.raises(ESQLError, match="at least two"):
        run_esql(cat, "FROM events-a | FORK (LIMIT 1)")
    with pytest.raises(ESQLError, match="cannot be nested"):
        run_esql(cat, "FROM events-a | FORK (LIMIT 1) "
                      "(FORK (LIMIT 1) (LIMIT 2))")
    with pytest.raises(ESQLError, match="not valid inside"):
        run_esql(cat, "FROM events-a | FORK (LIMIT 1) (FROM events-b)")


def test_function_translation_to_family(cat):
    out = run_esql(cat, """
        FROM events-a
        | EVAL s = TO_STRING(id), i = TO_INTEGER("12"),
               bad = TO_INTEGER("xyz"), d = TO_DOUBLE("1.5")
        | SORT id | LIMIT 1
    """)
    r = out.collect()[0]
    assert r.s == "1" and r.i == 12 and r.bad is None and r.d == 1.5


def test_function_translation_mv_family(cat, spark):
    c = Catalog(spark)
    c.register("arr", spark.createDataFrame(
        [(1, [3.0, 1.0, 2.0]), (2, None)], "id long, xs array<double>"))
    out = run_esql(c, """
        FROM arr
        | EVAL n = MV_COUNT(xs), lo = MV_MIN(xs), hi = MV_MAX(xs),
               tot = MV_SUM(xs), avg_v = MV_AVG(xs),
               first_v = MV_FIRST(MV_SORT(xs, "DESC")),
               joined = MV_CONCAT(MV_SORT(TO_STRING_ARR(xs)), ",")
        | SORT id
    """.replace("TO_STRING_ARR(xs)", "transform(xs, v -> CAST(v AS STRING))"))
    r1, r2 = out.collect()
    assert (r1.n, r1.lo, r1.hi, r1.tot, r1.avg_v) == (3, 1.0, 3.0, 6.0, 2.0)
    assert r1.first_v == 3.0 and r1.joined == "1.0,2.0,3.0"
    assert r2.n is None and r2.tot is None


def test_function_translation_date_family(cat, spark):
    c = Catalog(spark)
    c.register("t", spark.sql(
        "SELECT 1 AS id, TIMESTAMP '2024-03-05 10:30:00' AS ts, "
        "TIMESTAMP '2024-03-07 22:30:00' AS ts2"))
    out = run_esql(c, """
        FROM t
        | EVAL day = DATE_FORMAT("yyyy-MM-dd", ts),
               yr = DATE_EXTRACT("year", ts),
               hours = DATE_DIFF("hour", ts, ts2)
    """)
    r = out.collect()[0]
    assert r.day == "2024-03-05" and r.yr == 2024 and r.hours == 60
    # untranslated names pass through to Spark SQL unchanged
    out2 = run_esql(c, 'FROM t | EVAL x = concat("a", "b") | KEEP x')
    assert out2.collect()[0].x == "ab"


def test_translation_skips_string_literals_and_prefixed_names(cat):
    # a literal containing a mapped name must not be rewritten; an
    # identifier whose SUFFIX matches (my_TO_STRING) must not either
    out = run_esql(cat, """
        FROM events-a
        | EVAL lit = "TO_STRING(9)", up = TO_UPPER(etype)
        | SORT id | LIMIT 1
    """)
    r = out.collect()[0]
    assert r.lit == "TO_STRING(9)" and r.up == "CLICK"


def test_esql_fulltext_functions(spark):
    """QSTR/MATCH/KQL in WHERE: each call compiles through its grammar
    into a hidden marker predicate; composes with plain conditions; the
    marker columns never reach the output schema."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("docs", spark.createDataFrame(
        [
            (1, "spark makes queries fast", "eng", 5.0),
            (2, "slow queries hurt", "eng", 50.0),
            (3, "fast spark engine", "fra", 7.0),
        ],
        ["id", "title", "lang", "v"],
    ))
    out = run_esql(cat, '''
        FROM docs
        | WHERE QSTR("lang:eng") AND v < 20
        | KEEP id | SORT id
    ''')
    assert [r.id for r in out.collect()] == [1]
    assert out.columns == ["id"]
    out2 = run_esql(cat, '''
        FROM docs
        | WHERE MATCH(title, "spark slow") | KEEP id | SORT id
    ''')
    assert [r.id for r in out2.collect()] == [1, 2, 3]
    out3 = run_esql(cat, '''
        FROM docs
        | WHERE KQL("lang:fra or v >= 50") | KEEP id | SORT id
    ''')
    assert [r.id for r in out3.collect()] == [2, 3]
    out4 = run_esql(cat, '''
        FROM docs
        | WHERE MATCH(title, "fast spark", "operator=and") AND NOT lang == "fra"
        | KEEP id
    ''')
    assert [r.id for r in out4.collect()] == [1]


def test_rerank_term_overlap_and_target(spark):
    """RERANK scores = matched distinct query tokens / total query
    tokens over the ON fields; custom target name; unknown column and
    unregistered endpoint raise."""
    import pytest

    from harmonize_search_analyze_spark.plans.esql import ESQLError, run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("d", spark.createDataFrame(
        [(1, "alpha beta", "x"), (2, "gamma", "alpha")],
        ["id", "t1", "t2"],
    ))
    cat.register_inference(
        "rr", {"task_type": "rerank", "type": "term_overlap"}
    )
    out = run_esql(cat, """
        FROM d
        | RERANK s = "alpha gamma" ON t1, t2 WITH rr
        | KEEP id, s | SORT id
    """).collect()
    # doc 1: alpha matches (t1), gamma absent -> 1/2; doc 2: both
    # (gamma in t1, alpha in t2) -> 2/2
    assert [(r.id, r.s) for r in out] == [(1, 0.5), (2, 1.0)]
    with pytest.raises(ESQLError, match="unknown column"):
        run_esql(cat, 'FROM d | RERANK "q" ON missing WITH rr')
    with pytest.raises(ESQLError, match="unknown inference endpoint"):
        run_esql(cat, 'FROM d | RERANK "q" ON t1 WITH nope')


def test_completion_echo_template_and_gate(spark):
    """COMPLETION templates the compiled prompt expression; non-stub
    model types raise the documented NotImplementedError gate; JSON
    WITH form resolves inference_id."""
    import pytest

    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("d", spark.createDataFrame([(1, "ab")], ["id", "t"]))
    cat.register_inference("llm", {
        "task_type": "completion", "type": "echo_template",
        "template": "<{prompt}>",
    })
    cat.register_inference("real-llm", {
        "task_type": "completion", "type": "openai_chat",
    })
    out = run_esql(cat, """
        FROM d
        | COMPLETION c = CONCAT(t, "!") WITH {"inference_id": "llm"}
        | KEEP id, c
    """).collect()
    assert [(r.id, r.c) for r in out] == [(1, "<ab!>")]
    with pytest.raises(NotImplementedError, match="external LLM"):
        run_esql(cat, "FROM d | COMPLETION c = t WITH real-llm")


def test_fuse_rrf_and_linear(spark):
    """FUSE merges FORK branches: rrf = sum 1/(k+rank) per branch,
    linear = sum of scores; non-key columns keep the first-branch
    occurrence; _fork disappears."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 5.0, "b"), (3, 1.0, "c")],
        ["_id", "v", "tag"],
    )
    cat.register("t", df)
    out = run_esql(cat, """
        FROM t
        | FORK (EVAL _score = v)
               (EVAL _score = CASE WHEN _id = 3 THEN 9.0 ELSE 0.5 END)
        | FUSE rrf WITH k = 10
    """).collect()
    got = {r._id: r._score for r in out}
    # branch1 ranks: 1,2,3 -> ranks 1,2,3; branch2: id3 rank1, id1 rank2, id2 rank3
    assert got[1] == round(1/11 + 1/12, 6)
    assert got[2] == round(1/12 + 1/13, 6)
    assert got[3] == round(1/13 + 1/11, 6)
    assert "_fork" not in {c for r in out for c in r.asDict()}
    # first-occurrence rule keeps tag from the better-ranked branch row
    tags = {r._id: r.tag for r in out}
    assert tags == {1: "a", 2: "b", 3: "c"}
    lin = run_esql(cat, """
        FROM t
        | FORK (EVAL _score = v) (EVAL _score = v * 2)
        | FUSE linear
    """).collect()
    assert {r._id: r._score for r in lin} == {1: 30.0, 2: 15.0, 3: 3.0}


def test_fuse_errors(spark):
    import pytest

    from harmonize_search_analyze_spark.plans.esql import (
        ESQLError,
        run_esql,
    )
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("t", spark.createDataFrame([(1, 2.0)], ["_id", "v"]))
    with pytest.raises(ESQLError, match="_fork"):
        run_esql(cat, "FROM t | EVAL _score = v | FUSE")
    with pytest.raises(ESQLError, match="_score"):
        run_esql(cat, "FROM t | FORK (WHERE v > 0) (WHERE v > 1) | FUSE")
    with pytest.raises(ESQLError, match="KEY BY"):
        run_esql(cat, """
            FROM t | RENAME _id AS k
            | FORK (EVAL _score = v) (EVAL _score = v)
            | FUSE
        """)
    with pytest.raises(ESQLError, match="unknown columns"):
        run_esql(cat, """
            FROM t
            | FORK (EVAL _score = v) (EVAL _score = v)
            | FUSE rrf KEY BY nope
        """)


def test_ts_rate_two_level_rollup(spark):
    """TS + STATS avg(rate(counter)): per-series reset-aware rate, then
    the outer avg across series — hand-computed on two hosts with one
    counter reset; single-sample series contribute NULL (skipped)."""
    import datetime as dt

    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # host a: 0 -> 5 -> reset to 2: increase 5 + 2 = 7, span 20
        ("a", at(0), 0.0, 1.0),
        ("a", at(10), 5.0, 3.0),
        ("a", at(20), 2.0, 2.0),
        # host b: 10 -> 30: increase 20, span 10 -> rate 2.0
        ("b", at(0), 10.0, 10.0),
        ("b", at(10), 30.0, 20.0),
        # host c: single sample -> undefined rate, skipped by avg
        ("c", at(5), 99.0, 7.0),
    ]
    cat = Catalog(spark)
    cat.register(
        "metrics",
        spark.createDataFrame(rows, ["host", "ts", "counter", "gauge"]),
    )
    out = run_esql(cat, """
        TS metrics ON ts BY host
        | STATS r = avg(rate(counter)),
                g = max(avg_over_time(gauge)),
                last = sum(last_over_time(gauge))
          BY day = DATE_TRUNC("day", ts)
    """).collect()
    assert len(out) == 1
    row = out[0]
    # rates: a = 7/20 = 0.35, b = 20/10 = 2.0; avg = 1.175
    assert abs(row.r - 1.175) < 1e-9
    # per-series gauge means: a = 2.0, b = 15.0, c = 7.0 -> max 15
    assert row.g == 15.0
    # last gauge per series: a = 2.0 (ts 20), b = 20.0, c = 7.0 -> 29
    assert row.last == 29.0


def test_ts_errors(spark):
    import pytest

    from harmonize_search_analyze_spark.plans.esql import (
        ESQLError,
        run_esql,
    )
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register(
        "m", spark.createDataFrame([("a", 1, 2.0)], ["h", "ts", "v"])
    )
    with pytest.raises(ESQLError, match="ON"):
        run_esql(cat, "TS m | LIMIT 1")
    with pytest.raises(ESQLError, match="unknown columns"):
        run_esql(cat, "TS m ON nope BY h | LIMIT 1")
    with pytest.raises(ESQLError, match="outer"):
        run_esql(cat, "TS m ON ts BY h | STATS rate(v) BY k = h")
    with pytest.raises(ESQLError, match="BY bucket"):
        run_esql(cat, "TS m ON ts BY h | STATS s = sum(rate(v))")
    # plain STATS after TS (no ts functions) behaves normally
    got = run_esql(
        cat, "TS m ON ts BY h | STATS n = count(*) BY h"
    ).collect()
    assert got[0].n == 1


def test_fuse_linear_minmax(spark):
    """linear minmax rescales each branch to [0,1] before summing (the
    ES linear-retriever normalizer); constant-score branches contribute
    1; normalizer on rrf is rejected."""
    import pytest

    from harmonize_search_analyze_spark.plans.esql import (
        ESQLError,
        run_esql,
    )
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("t", spark.createDataFrame(
        [(1, 100.0), (2, 300.0), (3, 200.0)], ["_id", "v"]
    ))
    out = run_esql(cat, """
        FROM t
        | FORK (EVAL _score = v)
               (EVAL _score = CASE WHEN _id = 1 THEN 0.9 ELSE 0.1 END)
               (EVAL _score = 5.0)
        | FUSE linear minmax
    """).collect()
    got = {r._id: r._score for r in out}
    # branch1 minmax: id1 0, id2 1, id3 0.5; branch2: id1 1, others 0;
    # branch3 constant -> 1 each
    assert got[1] == 2.0 and got[2] == 2.0 and got[3] == 1.5
    with pytest.raises(ESQLError, match="normalizer"):
        run_esql(cat, """
            FROM t
            | FORK (EVAL _score = v) (EVAL _score = v)
            | FUSE rrf minmax
        """)
