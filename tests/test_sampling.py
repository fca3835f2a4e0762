"""Sampling operators: determinism, bounds, stratum caps, and the
properties df.sample() can't give (partition-layout independence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], ["web", "book"][i % 2])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source"])


def test_hash_sample_deterministic_and_layout_independent(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert a == b
    # same rows under a different partition layout (df.sample() fails this)
    c = {r["doc_id"] for r in
         hash_sample(docs.repartition(17), "doc_id", 0.3).collect()}
    assert a == c
    # roughly the requested fraction (hash uniformity, 300 rows)
    assert 0.15 <= len(a) / 300 <= 0.45
    # a larger fraction strictly contains a smaller one (threshold nesting)
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.6).collect()}
    assert a <= big
    # different seed -> different selection
    d = {r["doc_id"] for r in
         hash_sample(docs, "doc_id", 0.3, seed=7).collect()}
    assert a != d


def test_hash_sample_bounds(docs):
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 300
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_stratified_sample_caps_and_determinism(docs):
    out = stratified_sample(docs, ["lang", "source"], 10, "doc_id")
    per = out.groupBy("lang", "source").count().collect()
    assert len(per) == 6                       # every stratum represented
    assert all(r["count"] == 10 for r in per)  # 50 per stratum, capped at 10
    again = stratified_sample(docs, ["lang", "source"], 10, "doc_id")
    assert {tuple(r) for r in out.collect()} == \
        {tuple(r) for r in again.collect()}
    # a stratum smaller than the cap is kept whole
    few = docs.where((F.col("lang") == "en") & (F.col("doc_id") < 12))
    kept = stratified_sample(few, ["lang"], 100, "doc_id")
    assert kept.count() == few.count()
    with pytest.raises(ValueError):
        stratified_sample(docs, ["lang"], 0, "doc_id")


def test_mix_sources_rates(spark):
    from harmonize_search_analyze_spark.operators.sampling import mix_sources

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        ["id", "src"],
    )
    out = mix_sources(df, "src", {"a": 1.0, "b": 0.25}, "id")
    by_src = {r["src"]: r["cnt"] for r in
              out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    assert by_src["a"] == 1000                  # rate 1.0 keeps everything
    assert 150 <= by_src.get("b", 0) <= 350     # ~25% of 1000
    # deterministic: same call -> same rows
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in
                  mix_sources(df, "src", {"a": 1.0, "b": 0.25}, "id").collect())
    assert ids1 == ids2


def test_mix_sources_default_drops_unknown(spark):
    from harmonize_search_analyze_spark.operators.sampling import mix_sources

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "src"])
    assert mix_sources(df, "src", {"x": 1.0}, "id").count() == 1
    with pytest.raises(ValueError):
        mix_sources(df, "src", {"x": 1.5}, "id")


def test_upsample_sources_epochs(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        upsample_sources,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        ["id", "src"],
    )
    out = upsample_sources(df, "src", {"a": 2.5, "b": 0.5}, "id")
    by = {r["src"]: r["cnt"] for r in
          out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    # a: every row 2x or 3x -> ~2.5x of 500; b: ~50% of 500
    assert 1150 <= by["a"] <= 1350
    assert 180 <= by["b"] <= 320
    # epochs per id are 1..reps with no gaps
    a_epochs = (out.where(F.col("src") == "a").groupBy("id")
                .agg(F.max("epoch").alias("mx"), F.count("*").alias("c"))
                .collect())
    assert all(r["mx"] == r["c"] and r["mx"] in (2, 3) for r in a_epochs)
    # deterministic across invocations
    c1 = out.count()
    assert upsample_sources(df, "src", {"a": 2.5, "b": 0.5}, "id").count() == c1


def test_upsample_rejects_negative(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        upsample_sources,
    )

    df = spark.createDataFrame([(1, "x")], ["id", "src"])
    with pytest.raises(ValueError):
        upsample_sources(df, "src", {"x": -1.0}, "id")


def test_weighted_sample_proportional_and_deterministic(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        weighted_sample,
    )

    # 500 light rows (w=1) + 100 heavy rows (w=50): heavy rows are ~91%
    # of total weight, so a k=50 draw should be heavy-dominated
    rows = [(i, 1.0) for i in range(500)] + [
        (1000 + i, 50.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = [r["id"] for r in weighted_sample(df, "w", 50, "id").collect()]
    assert len(got) == len(set(got)) == 50     # without replacement
    heavy = sum(1 for i in got if i >= 1000)
    assert heavy >= 35                          # ~45 expected
    # deterministic re-draw
    again = [r["id"] for r in weighted_sample(df, "w", 50, "id").collect()]
    assert got == again
    # zero/negative weights never drawn
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 1.0)], ["id", "w"])
    assert [r["id"] for r in
            weighted_sample(df2, "w", 5, "id").collect()] == [3]


def test_source_names_with_quotes_escape_in_both_dialects(spark):
    """A source name containing an apostrophe (O'Reilly) must produce
    valid SQL in both generated dialects and match the DataFrame op."""
    import duckdb

    from harmonize_search_analyze_spark.operators.sampling import (
        mix_sources,
        mix_sources_sql,
        upsample_sources_sql,
    )

    rows = [(i, "O'Reilly" if i % 2 else "web") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "src"])
    rates = {"O'Reilly": 1.0, "web": 0.0}
    want = sorted(
        r["id"] for r in mix_sources(df, "src", rates, "id").collect()
    )
    assert want and all(i % 2 for i in want)

    sql_spark = mix_sources_sql("t", "src", rates, "id", ["id"], "spark")
    df.createOrReplaceTempView("t")
    got_spark = sorted(r["id"] for r in spark.sql(sql_spark).collect())
    spark.catalog.dropTempView("t")
    assert got_spark == want

    con = duckdb.connect()
    duck_lit = {True: "'O''Reilly'", False: "'web'"}
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, {duck_lit[bool(i % 2)]})"
                            for i in range(40))
                + ") v(id, src)")
    sql_duck = mix_sources_sql("t", "src", rates, "id", ["id"], "duckdb")
    got_duck = sorted(r[0] for r in con.execute(sql_duck).fetchall())
    assert got_duck == want
    # upsample generator parses too (both dialects)
    up_duck = upsample_sources_sql(
        "t", "src", {"O'Reilly": 2.0}, "id", ["id"], "duckdb",
        default_rate=1.0)
    assert con.execute(up_duck).fetchall()


def test_temperature_mix_flattens_sources(spark):
    """alpha<1 keeps small sources at a HIGHER rate than large ones;
    alpha=1 is proportional; thresholds derive in-plan (no collect) and
    match the DuckDB twin exactly."""
    import duckdb
    import pandas as pd

    from harmonize_search_analyze_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_sql,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = temperature_mix(df, "src", "id", alpha=0.3, out_fraction=0.5)
    got = out.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    # 900/100 split at alpha=0.3: q_small/q_big = (100/900)^0.3 ~ 0.52,
    # so per-row keep rate for small = rate_big * (900/100)^0.7 ~ 4.6x
    rate_big = by.get("big", 0) / 900
    rate_small = by.get("small", 0) / 100
    assert rate_small > 2.5 * rate_big, (rate_big, rate_small)
    # deterministic
    again = {r["src"]: r["count"] for r in
             temperature_mix(df, "src", "id", alpha=0.3,
                             out_fraction=0.5).groupBy("src")
             .count().collect()}
    assert again == by

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "src"]))
    want = sorted(r[0] for r in con.execute(temperature_mix_sql(
        "t", "src", "id", ["id"], "duckdb", alpha=0.3,
        out_fraction=0.5)).fetchall())
    assert sorted(r["id"] for r in out.select("id").collect()) == want

    # alpha=1: proportional — every source keeps ~out_fraction
    prop = temperature_mix(df, "src", "id", alpha=1.0, out_fraction=0.5)
    byp = {r["src"]: r["count"] for r in prop.groupBy("src").count().collect()}
    assert abs(byp["big"] / 900 - 0.5) < 0.1
    with pytest.raises(ValueError):
        temperature_mix(df, "src", "id", alpha=0.0)


def test_quality_mix_bands_and_validation(spark):
    from harmonize_search_analyze_spark.operators.sampling import quality_mix

    # high-quality prose vs degenerate repetition: the heuristic separates
    # them, and the band rates then control survival deterministically
    rows = [(i, "the quick brown fox jumps over the lazy dog today")
            for i in range(20)]
    rows += [(100 + i, "aaa aaa aaa") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = quality_mix(
        df, "text", "doc_id", cuts=[0.57], rates=[1.0, 0.0]
    ).collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == list(range(20))  # every prose row, zero degenerate rows
    with pytest.raises(ValueError):
        quality_mix(df, "text", "doc_id", cuts=[0.5], rates=[1.0])
    with pytest.raises(ValueError):
        quality_mix(df, "text", "doc_id", cuts=[0.3, 0.6], rates=[1, 1, 1])
    with pytest.raises(ValueError):
        quality_mix(df, "text", "doc_id", cuts=[0.5], rates=[1.0, 1.5])


def test_function_score_modifiers(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        field_value_factor_sql,
        function_score,
    )

    df = spark.createDataFrame(
        [(1, 9), (2, 99), (3, None), (4, 999)], ["doc_id", "views"]
    )
    got = function_score(
        df, F.lit(True), "views", modifier="log1p", factor=1.0,
        weight=1.0, missing=0.0, k=4,
    ).collect()
    # log10(1+views): 999 -> 3, 99 -> 2, 9 -> 1, missing -> 0
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (4, 3.0), (2, 2.0), (1, 1.0), (3, 0.0)
    ]
    with pytest.raises(ValueError):
        field_value_factor_sql("views", modifier="cube")


def test_token_budget_sample_boundary_and_default(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [
        (i, "a", "one two three four five")  # 5 tokens each
        for i in range(10)
    ] + [(100 + i, "b", "one two") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # budget 12 admits exactly two 5-token docs (cum 5, 10; third hits 15)
    out = token_budget_sample(
        df, "source", {"a": 12}, "doc_id", "text", default_budget=None
    ).collect()
    a = [r for r in out if r["source"] == "a"]
    b = [r for r in out if r["source"] == "b"]
    assert len(a) == 2 and max(r["cum_tokens"] for r in a) == 10
    assert len(b) == 3  # default None = unlimited pass-through
    # zero budget keeps nothing from the capped source
    out0 = token_budget_sample(
        df, "source", {"a": 0}, "doc_id", "text", default_budget=None
    ).collect()
    assert all(r["source"] == "b" for r in out0)
    # determinism: same admission set on re-run
    again = token_budget_sample(
        df, "source", {"a": 12}, "doc_id", "text", default_budget=None
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out
    )
    with pytest.raises(ValueError):
        token_budget_sample(df, "source", {"a": -1}, "doc_id", "text")


def test_token_budget_monotonicity(spark):
    """Raising a budget only ADDS documents (admission order is a stable
    hash-ordered prefix), and the kept set is partition-layout
    independent."""
    from harmonize_search_analyze_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [(i, "s", "tok " * (i % 7 + 1)) for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    kept = {}
    for budget in (20, 60, 200):
        kept[budget] = {
            r["doc_id"]
            for r in token_budget_sample(
                df, "source", {"s": budget}, "doc_id", "text"
            ).collect()
        }
    assert kept[20] <= kept[60] <= kept[200]
    assert len(kept[20]) < len(kept[200])
    relaid = {
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(13), "source", {"s": 60}, "doc_id", "text"
        ).collect()
    }
    assert relaid == kept[60]


def test_quality_mix_rate_monotonicity(spark):
    """A higher tail rate keeps a superset (hash thresholds nest)."""
    from harmonize_search_analyze_spark.operators.sampling import quality_mix

    rows = [(i, f"sentence number {i} with several plain words here")
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    small = {r["doc_id"] for r in quality_mix(
        df, "text", "doc_id", cuts=[0.99], rates=[1.0, 0.2]).collect()}
    large = {r["doc_id"] for r in quality_mix(
        df, "text", "doc_id", cuts=[0.99], rates=[1.0, 0.6]).collect()}
    assert small <= large and len(small) < len(large) < 200


def test_unimax_waterfill_allocation(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )

    # tiny lang (20 rows), medium (100), huge (1000); budget 600 rows,
    # max_epochs 3: tiny caps at 60 (3 epochs), the rest waterfills
    rows = (
        [(f"a{i}", "tiny") for i in range(20)]
        + [(f"b{i}", "mid") for i in range(100)]
        + [(f"c{i}", "big") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, ["key", "lang"])
    got = unimax_sample(df, "lang", "key", budget=600.0, max_epochs=3.0)
    counts = {r.lang: r.cnt for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    # tiny exhausted: exactly 3 epochs x 20 = 60 (integral rate, exact)
    assert counts["tiny"] == 60
    # remaining 540 split evenly: 270 each (hash sampler => expectation;
    # mid upsamples 2.7x and big downsamples 0.27x)
    assert 230 <= counts["mid"] <= 310, counts
    assert 230 <= counts["big"] <= 310, counts
    # no source exceeds max_epochs
    max_epoch = got.agg(F.max("epoch")).collect()[0][0]
    assert max_epoch <= 3


def test_unimax_budget_exceeding_capacity_takes_everything(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )

    df = spark.createDataFrame(
        [(f"k{i}", "a" if i < 10 else "b") for i in range(30)],
        ["key", "lang"],
    )
    got = unimax_sample(df, "lang", "key", budget=1e9, max_epochs=2.0)
    counts = {r.lang: r.cnt for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"a": 20, "b": 40}  # every source at full capacity


def test_unimax_validation(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )

    with pytest.raises(ValueError):
        unimax_sample(None, "lang", "key", budget=0)
    with pytest.raises(ValueError):
        unimax_sample(None, "lang", "key", budget=10, max_epochs=0)


def test_unimax_equal_sources_split_evenly(spark):
    """Regression (review finding): with the capacity-prefix shortcut the
    water level collapsed after rank 1 — three equal 100-row sources at
    budget 150 allocated 50/25/0 instead of 50/50/50. The correct level
    is the running-max fair share."""
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )

    rows = [(f"{s}{i}", f"src{s}") for s in range(3) for i in range(100)]
    df = spark.createDataFrame(rows, ["key", "lang"])
    got = unimax_sample(df, "lang", "key", budget=150.0, max_epochs=1.0)
    counts = {r.lang: r.c for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    # every source rate = 0.5: realized counts are hash-binomial ~50 each;
    # the buggy 0.5/0.25/0 rates put src1 ~25 and src2 at exactly 0
    assert set(counts) == {"src0", "src1", "src2"}
    for s, c in counts.items():
        assert 32 <= c <= 68, (s, c, counts)


def test_anneal_schedule_single_scan_and_composition(spark):
    """Anneal schedule: per-phase rates independent (phase reseeds);
    absent sources drop; the plan reads the corpus ONCE (one scan node,
    no union of scans)."""
    from harmonize_search_analyze_spark.operators.sampling import (
        anneal_schedule,
    )

    rows = [(i, "web" if i % 2 == 0 else "books") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    phases = [("bulk", {"web": 1.0}), ("anneal", {"books": 1.0, "web": 0.2})]
    out = anneal_schedule(df, "source", "doc_id", phases)
    rolled = {(r.phase, r.source): r.n for r in out.groupBy(
        "phase", "source").agg(__import__("pyspark").sql.functions.count(
            "*").alias("n")).collect()}
    assert rolled[("bulk", "web")] == 200          # rate 1.0 keeps all
    assert rolled[("anneal", "books")] == 200
    assert 10 <= rolled.get(("anneal", "web"), 0) <= 80  # ~20% of 200
    assert ("bulk", "books") not in rolled         # default_rate drops
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Scan") == 1, plan           # single corpus scan
    # order keys exist and are deterministic across invocations
    a = sorted(r.order_key for r in out.where("phase = 'bulk'").collect())
    b = sorted(r.order_key for r in anneal_schedule(
        df, "source", "doc_id", phases).where("phase = 'bulk'").collect())
    assert a == b


def test_domain_reweight_softmax_and_floor(spark):
    """Weights sum to 1, order follows mean score, the floor binds, and
    temperature -> inf flattens toward uniform."""
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.sampling import (
        domain_reweight,
    )

    rows = [("good", 0.9)] * 5 + [("mid", 0.5)] * 5 + [("bad", 0.1)] * 5
    df = spark.createDataFrame(rows, ["source", "q"])
    out = {r.domain: r.weight for r in domain_reweight(
        df, "source", F.col("q"), temperature=0.2, floor=0.05
    ).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-4
    assert out["good"] > out["mid"] > out["bad"] >= 0.05
    flat = {r.domain: r.weight for r in domain_reweight(
        df, "source", F.col("q"), temperature=1e9
    ).collect()}
    for w in flat.values():
        assert abs(w - 1.0 / 3) < 1e-3


def test_preference_pairs_semantics(spark):
    """Best/worst per group become (chosen, rejected); zero-margin
    groups (single candidate, exact ties) drop; score ties pin to the
    lexicographically larger/smaller response; one hash agg (no
    Window) in the plan."""
    from harmonize_search_analyze_spark.operators.sampling import (
        preference_pairs,
    )

    df = spark.createDataFrame(
        [("p1", "bad", 0.1), ("p1", "good", 0.9), ("p1", "mid", 0.5),
         ("p2", "only", 0.7),
         ("p3", "tie_a", 0.5), ("p3", "tie_b", 0.5),
         ("p4", "zz", 0.5), ("p4", "aa", 0.5), ("p4", "top", 0.8)],
        ["prompt", "resp", "score"],
    )
    out = preference_pairs(df, "prompt", "resp", "score")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        ("p1", "good", "bad", 0.8, 3),
        # p4: worst is the tie (0.5, aa) < (0.5, zz) by struct order
        ("p4", "top", "aa", 0.3, 3),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Window" not in plan


def test_domain_reweight_floor_guard(spark):
    """ADVICE r4: floor * n_domains > 1 makes the renormalization scale
    negative (weights invert and stop summing to 1) — the in-plan
    assert_true guard must raise instead."""
    import pytest

    from harmonize_search_analyze_spark.operators.sampling import (
        domain_reweight,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], ["domain", "score"]
    )
    ok = domain_reweight(df, "domain", "score", floor=0.2).collect()
    assert abs(sum(r.weight for r in ok) - 1.0) < 1e-4
    assert all(r.weight >= 0.2 - 1e-9 for r in ok)
    with pytest.raises(Exception, match="floor"):
        domain_reweight(df, "domain", "score", floor=0.4).collect()


def test_negative_sampling_contract(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        negative_sampling,
    )

    positives = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], ["query_id", "doc_id"]
    )
    docs = spark.createDataFrame(
        [(d,) for d in range(10, 30)], ["doc_id"]
    )
    out = negative_sampling(positives, docs, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    pos = {1: {10, 11}, 2: {12}}
    for q, rows in by_q.items():
        got_docs = [r["doc_id"] for r in rows]
        # negatives never collide with that query's positives
        assert not (set(got_docs) & pos[q])
        # k per query, distinct, contiguous neg_rank
        assert len(got_docs) == len(set(got_docs)) == 5
        assert sorted(r["neg_rank"] for r in rows) == list(range(5))
    # deterministic across partitionings and reruns
    again = negative_sampling(
        positives.repartition(3), docs.repartition(4), k=5
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # different seed, different draws (with overwhelming probability)
    other = negative_sampling(positives, docs, k=5, seed=7).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negative_sampling_short_when_pool_exhausted(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        negative_sampling,
    )

    # 3-doc pool, 2 positive: at most 1 negative exists
    positives = spark.createDataFrame(
        [(1, 10), (1, 11)], ["query_id", "doc_id"]
    )
    docs = spark.createDataFrame([(10,), (11,), (12,)], ["doc_id"])
    out = negative_sampling(positives, docs, k=4, oversample=20).collect()
    assert [(r["query_id"], r["doc_id"]) for r in out] == [(1, 12)]
