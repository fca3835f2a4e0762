"""Property-based tests (hypothesis) for the training-pipeline operators:
invariants that must hold for ANY input, complementing the hand cases and
the oracle gate (SURVEY §5 test-strategy model)."""

from __future__ import annotations

import math

import pytest

from hypothesis import given, settings, strategies as st

words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(words=words, chunk=st.integers(2, 8), stride_off=st.integers(0, 6))
def test_chunk_reconstruction_property(spark, words, chunk, stride_off):
    """De-overlapping the chunks reproduces the original token stream
    exactly: chunk 0 in full, then each later chunk's tokens after the
    (chunk - stride)-token overlap."""
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )

    stride = max(1, chunk - stride_off)
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    )
    rebuilt: list[str] = []
    for idx, chunk_text, n_tokens in rows:
        toks = chunk_text.split(" ")
        assert len(toks) == n_tokens
        # window idx starts at token idx*stride; everything already in
        # rebuilt beyond that point is this chunk's leading overlap (the
        # whole chunk, for a trailing window clipped at the doc end)
        overlap = len(rebuilt) - idx * stride
        assert 0 <= overlap <= len(toks)
        assert toks[:overlap] == rebuilt[idx * stride:]
        rebuilt.extend(toks[overlap:])
    assert rebuilt == [w for w in words]
    # window i covers [i*stride, i*stride + chunk) clipped at the doc end
    for idx, _, n_tokens in rows:
        assert n_tokens == min(chunk, len(words) - idx * stride)


@settings(max_examples=15, deadline=None)
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=2, max_size=16
    )
)
def test_quantization_error_bound_property(spark, vec):
    """Dequantization error of every component is bounded by ~scale/2, and
    scale is round(max|x|/127, 12) (the operator rounds for cross-engine
    hash stability — sub-1e-10 magnitudes flush to scale 0 by contract)."""
    from hypothesis import assume

    from harmonize_search_analyze_spark.operators.similarity import (
        quantize_embeddings,
    )

    maxabs = max(abs(v) for v in vec)
    assume(maxabs == 0 or maxabs >= 0.01)
    df = spark.createDataFrame(
        [(1, [float(v) for v in vec])], "vec_id long, embedding array<double>"
    )
    r = quantize_embeddings(df).collect()[0]
    if maxabs == 0:
        assert r["scale"] == 0.0 and all(q == 0 for q in r["qvec"])
        return
    scale = round(maxabs / 127.0, 12)
    assert math.isclose(r["scale"], scale, rel_tol=1e-6)
    for q, v in zip(r["qvec"], vec):
        assert abs(q) <= 127
        assert abs(q * scale - v) <= scale / 2 + scale * 1e-6


@settings(max_examples=10, deadline=None)
@given(
    ranks_a=st.permutations(list(range(1, 6))),
    ranks_b=st.permutations(list(range(1, 6))),
)
@pytest.mark.slow
def test_rrf_list_order_invariance_property(spark, ranks_a, ranks_b):
    """RRF is symmetric in its input lists: fuse([a, b]) == fuse([b, a]),
    and every score is positive and bounded by n_lists/(rrf_k+1)."""
    from harmonize_search_analyze_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        list(zip(range(5), ranks_a)), "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        list(zip(range(3, 8), ranks_b)), "doc_id long, rank int"
    )
    ab = {(r["doc_id"], r["rrf_score"], r["n_lists"])
          for r in rrf_fuse([a, b], k=20).collect()}
    ba = {(r["doc_id"], r["rrf_score"], r["n_lists"])
          for r in rrf_fuse([b, a], k=20).collect()}
    assert ab == ba
    for _, score, n_lists in ab:
        assert 0 < score <= round(n_lists / 61.0, 6) + 1e-9


@settings(max_examples=30, deadline=None)
@given(
    pattern=st.text(alphabet="ab*?.+[x", min_size=0, max_size=8),
    value=st.text(alphabet="abx.?*", min_size=0, max_size=10),
)
def test_wildcard_regex_matches_fnmatch(pattern, value):
    """The wildcard->regex translation must agree with Python's fnmatch on
    every pattern, including regex metacharacters used as literals."""
    import fnmatch
    import re

    from harmonize_search_analyze_spark.plans.compiler import (
        _wildcard_regex,
    )

    got = re.fullmatch(_wildcard_regex(pattern), value) is not None
    want = fnmatch.fnmatchcase(value, pattern)
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    haystack_words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0,
        max_size=8,
    ),
    needle_words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=1,
        max_size=3,
    ),
)
def test_phrase_regex_is_contiguous_sublist(haystack_words, needle_words):
    """phrase_regex matches iff the needle token list appears as a
    CONTIGUOUS sublist of the haystack tokens (the pinned match_phrase
    contract)."""
    import re

    from harmonize_search_analyze_spark.functions.tokenize import (
        phrase_regex,
    )

    text = " ".join(haystack_words)
    pat = phrase_regex(" ".join(needle_words))
    got = bool(pat) and re.search(pat, text.lower()) is not None
    n, h = needle_words, haystack_words
    want = any(
        h[i:i + len(n)] == n for i in range(len(h) - len(n) + 1)
    )
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["shared line of text", "another common line",
                 "unique %d", "x"]
            ),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=5,
    )
)
def test_line_dedup_conservation(spark, docs):
    """Line accounting invariant: kept + dropped == total lines, every
    duplicated over-threshold line survives exactly once corpus-wide, and
    short lines are never dropped."""
    from harmonize_search_analyze_spark.operators.dedup import line_dedup

    rows = [
        (i, "\n".join(line % i if "%d" in line else line for line in d))
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup(df, "doc_id", "text", min_line_chars=5).collect()
    total_lines = sum(len(d) for d in docs)
    assert sum(r["n_kept"] + r["n_dropped"] for r in out) == total_lines
    # corpus-wide: every distinct long line appears exactly once in the
    # reassembled texts; short lines ('x') survive everywhere
    kept_lines = [
        ln for r in out for ln in (r["text"].split("\n") if r["text"] else [])
    ]
    long_lines = [l for l in kept_lines if len(l.strip()) >= 5]
    assert len(long_lines) == len(set(long_lines))
    n_x_in = sum(1 for d in docs for line in d if line == "x")
    assert kept_lines.count("x") == n_x_in


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(
        st.text(alphabet="abcdefghij", min_size=1, max_size=8),
        min_size=1, max_size=60, unique=True,
    ),
    n_corpus=st.integers(0, 40),
)
@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
def test_bloom_dedup_always_equals_anti_join(spark, keys, n_corpus):
    """For ANY key universe and corpus/batch split, bloom_dedup returns
    exactly the anti-join — false positives verified away, no false
    negatives possible."""
    from harmonize_search_analyze_spark.operators.bloom import bloom_dedup

    corpus_keys = keys[:n_corpus]
    corpus = spark.createDataFrame(
        [(k,) for k in corpus_keys] or [("__never__",)], ["key"]
    )
    batch = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = sorted(r.key for r in bloom_dedup(
        corpus, batch, "key", m_bits=1024, k=3).collect())
    want = sorted(set(keys) - set(corpus_keys or ["__never__"]))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    fracs=st.lists(
        st.floats(0.05, 1.0), min_size=1, max_size=4
    ),
    n=st.integers(1, 80),
)
def test_assign_split_partition_property(spark, fracs, n):
    """Splits always partition the input: every row gets exactly one
    label from the fraction dict, regardless of the fraction shape."""
    from harmonize_search_analyze_spark.operators.ordering import (
        assign_split,
    )

    total = sum(fracs)
    fractions = {f"s{i}": f / total for i, f in enumerate(fracs)}
    # renormalization drift: force exact sum by adjusting the last label
    fractions[f"s{len(fracs) - 1}"] += 1.0 - sum(fractions.values())
    df = spark.createDataFrame([(i,) for i in range(n)], ["k"])
    out = assign_split(df, "k", fractions).collect()
    assert len(out) == n
    assert {r.split for r in out} <= set(fractions)


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=5),
    budget=st.floats(1.0, 300.0),
    max_epochs=st.floats(0.5, 3.0),
)
def test_unimax_never_exceeds_caps(spark, sizes, budget, max_epochs):
    """UniMax invariants for ANY source-size profile: per-source output
    never exceeds ceil(max_epochs) repeats of the source, and when the
    budget exceeds total capacity every source is taken in full."""
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )
    import math

    rows = [
        (f"{s}:{i}", f"src{s}")
        for s, sz in enumerate(sizes)
        for i in range(sz)
    ]
    df = spark.createDataFrame(rows, ["key", "lang"])
    out = unimax_sample(
        df, "lang", "key", budget=budget, max_epochs=max_epochs
    )
    counts = {
        r.lang: r.c
        for r in out.groupBy("lang").count().withColumnRenamed(
            "count", "c"
        ).collect()
    }
    for s, sz in enumerate(sizes):
        got = counts.get(f"src{s}", 0)
        assert got <= sz * math.ceil(max_epochs)
    if budget >= sum(sizes) * max_epochs:
        # full-capacity regime: every source repeats at least
        # floor(max_epochs) times exactly (the fractional remainder is
        # the hash sampler's expectation, not a per-run guarantee)
        whole = math.floor(max_epochs)
        for s, sz in enumerate(sizes):
            assert counts.get(f"src{s}", 0) >= sz * whole


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
        min_size=1, max_size=8,
    ),
    qwords=st.lists(st.sampled_from("abcd"), min_size=2, max_size=3),
    max_gaps=st.integers(-1, 3),
    ordered=st.booleans(),
)
def test_intervals_match_against_python_reference(
    spark, docs, qwords, max_gaps, ordered
):
    """The nested-EXISTS intervals predicate must agree with a direct
    Python enumeration of position combinations for ANY token stream."""
    from itertools import product

    from harmonize_search_analyze_spark.plans.compiler import compile_query

    def ref_match(tokens):
        pos = [
            [i + 1 for i, t in enumerate(tokens) if t == w] for w in qwords
        ]
        for combo in product(*pos):
            if ordered:
                if any(b <= a for a, b in zip(combo, combo[1:])):
                    continue
            else:
                if len(set(combo)) != len(combo):
                    continue
            slack = max(combo) - min(combo) + 1 - len(qwords)
            if max_gaps < 0 or slack <= max_gaps:
                return True
        return False

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["id", "text"])
    rule = {"match": {
        "query": " ".join(qwords), "ordered": ordered, "max_gaps": max_gaps,
    }}
    got = sorted(r.id for r in df.where(
        compile_query({"intervals": {"text.split": rule}})).collect())
    want = sorted(i for i, d in enumerate(docs) if ref_match(d))
    assert got == want, (qwords, max_gaps, ordered, docs, got, want)


def test_eql_sequence_semantics_and_plan(spark):
    """EQL sequence: full chains found, out-of-order and out-of-maxspan
    chains rejected, overlapping anchors both match (documented
    independent-anchor variant), and the window+joins share ONE key
    partitioning (no extra exchange per step)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, sec, typ):
        return (i, u, t0 + dt.timedelta(seconds=sec), typ)

    rows = [
        ev(1, 1, 0, "a"), ev(2, 1, 10, "b"), ev(3, 1, 20, "c"),
        ev(4, 2, 0, "a"), ev(5, 2, 5, "c"), ev(6, 2, 10, "b"),
        ev(7, 2, 15, "c"),
        ev(8, 3, 0, "a"), ev(9, 3, 4000, "b"),      # outside maxspan (2-step)
        ev(10, 4, 0, "b"), ev(11, 4, 5, "a"),        # wrong order
        ev(12, 5, 0, "a"), ev(13, 5, 2, "a"),        # overlapping anchors
        ev(14, 5, 5, "b"), ev(15, 5, 9, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    steps = ["event_type='a'", "event_type='b'", "event_type='c'"]
    out = eql_sequence(df, steps, maxspan_seconds=3600)
    got = sorted((r["user_id"], r["id1"], r["id2"], r["id3"])
                 for r in out.collect())
    assert got == [(1, 1, 2, 3), (2, 4, 6, 7), (5, 12, 14, 15),
                   (5, 13, 14, 15)]
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    # the single user_id window exchange; pointer joins reuse or broadcast
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_eql_sequence_until(spark):
    """EQL `until`: a chain is dropped when the until-event fires strictly
    inside its span; until at-or-after completion (or before the anchor)
    leaves the chain alone. Spark result == DuckDB twin."""
    import datetime as dt

    import duckdb

    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence,
        eql_sequence_sql,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, sec, typ):
        return (i, u, t0 + dt.timedelta(seconds=sec), typ)

    rows = [
        # u1: a,b with until x INSIDE the span -> dropped
        ev(1, 1, 0, "a"), ev(2, 1, 5, "x"), ev(3, 1, 10, "b"),
        # u2: until after completion -> kept
        ev(4, 2, 0, "a"), ev(5, 2, 10, "b"), ev(6, 2, 20, "x"),
        # u3: until before the anchor -> kept
        ev(7, 3, 0, "x"), ev(8, 3, 5, "a"), ev(9, 3, 10, "b"),
        # u4: no until at all -> kept
        ev(10, 4, 0, "a"), ev(11, 4, 5, "b"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    steps = ["event_type='a'", "event_type='b'"]
    out = eql_sequence(df, steps, until="event_type='x'")
    got = sorted((r["user_id"], r["id1"], r["id2"]) for r in out.collect())
    assert got == [(2, 4, 5), (3, 8, 9), (4, 10, 11)]

    con = duckdb.connect()
    con.register("events", out.sparkSession.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]).toPandas())
    sql = eql_sequence_sql("events", steps, until="event_type='x'")
    ora = sorted(tuple(r) for r in con.execute(
        f"SELECT user_id, id1, id2 FROM ({sql})").fetchall())
    assert ora == got


@settings(max_examples=10, deadline=None)
@given(
    lens=st.lists(st.integers(0, 600), min_size=1, max_size=60),
    bounds=st.lists(st.integers(1, 500), min_size=1, max_size=4,
                    unique=True).map(sorted),
    bs=st.integers(1, 9),
    shards=st.integers(1, 5),
)
def test_batch_by_length_partition_property(spark, lens, bounds, bs, shards):
    """ANY input: every row lands in exactly one batch; every batch stays
    inside one (bucket, shard); no batch exceeds batch_size; at most one
    runt batch per (bucket, shard); positions dense."""
    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length,
    )

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n long"
    )
    out = batch_by_length(
        df, "doc_id", "n", boundaries=bounds, batch_size=bs,
        n_shards=shards,
    ).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(lens)))
    groups: dict = {}
    for r in out:
        groups.setdefault(r.batch_key, []).append(r)
    runts_per_shard: dict = {}
    for key, members in groups.items():
        bucket, shard, _ = key.split("/")
        assert len(members) <= bs
        assert sorted(m.pos_in_batch for m in members) == list(
            range(len(members))
        )
        if members[0].is_runt:
            assert len(members) < bs
            runts_per_shard[(bucket, shard)] = (
                runts_per_shard.get((bucket, shard), 0) + 1
            )
    assert all(v == 1 for v in runts_per_shard.values())


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(1, 60),
    epochs=st.integers(1, 4),
    seed=st.integers(0, 1000),
)
@pytest.mark.slow
def test_epoch_shuffle_permutation_property(spark, n, epochs, seed):
    """ANY (corpus, epochs, seed): each epoch is a full permutation,
    positions are globally contiguous, and a DIFFERENT seed produces a
    different order for any non-trivial corpus."""
    from harmonize_search_analyze_spark.operators.ordering import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = epoch_shuffle(df, "doc_id", epochs=epochs, seed=seed,
                        rank=True).collect()
    assert sorted(r.pos for r in out) == list(range(n * epochs))
    for e in range(epochs):
        ids = sorted(r.doc_id for r in out if r.epoch == e)
        assert ids == list(range(n))
    if n >= 10:
        other = epoch_shuffle(df, "doc_id", epochs=epochs,
                              seed=seed + 1, rank=True).collect()
        order_a = [r.doc_id for r in sorted(out, key=lambda r: r.pos)]
        order_b = [r.doc_id for r in sorted(other, key=lambda r: r.pos)]
        assert order_a != order_b  # seed reaches the hash key


def test_eql_join_unordered_semantics(spark):
    """EQL join: any order qualifies; missing a step disqualifies; each
    step reports its FIRST (t,id); single hash agg (one exchange)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import eql_join

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, sec, typ):
        return (i, u, t0 + dt.timedelta(seconds=sec), typ)

    rows = [
        # u1: b before a (order must not matter); two a's -> first wins
        ev(1, 1, 0, "b"), ev(2, 1, 5, "a"), ev(3, 1, 9, "a"),
        # u2: only a -> no row
        ev(4, 2, 0, "a"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = eql_join(df, ["event_type='a'", "event_type='b'"])
    got = [(r.user_id, r.id1, r.id2) for r in out.collect()]
    assert got == [(1, 2, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_script_and_fertility_stages(spark):
    """The round-4 pipeline stages: script_filter keeps high-latin
    docs, fertility_filter drops long-word docs; unknown script raises."""
    import pytest

    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        run_corpus_pipeline,
    )

    df = spark.createDataFrame(
        [
            (1, "plain english words here"),
            (2, "мир труд май россия"),
            (3, "supercalifragilistic extraordinarily"),  # fertility > 2
        ],
        ["doc_id", "text"],
    )
    kept = run_corpus_pipeline(
        df, [{"script_filter": {"script": "latin", "min_ratio": 0.9}}]
    )
    assert {r.doc_id for r in kept.collect()} == {1, 3}
    # doc1: 7 pieces / 4 words = 1.75; doc3: 9/2 = 4.5; doc2 has ZERO
    # pinned-tokenizer words (cyrillic) so the w > 0 guard drops it
    kept2 = run_corpus_pipeline(
        df, [{"fertility_filter": {"max_fertility": 1.8}}]
    )
    assert {r.doc_id for r in kept2.collect()} == {1}
    with pytest.raises(ValueError, match="unknown script"):
        run_corpus_pipeline(
            df, [{"script_filter": {"script": "klingon"}}]
        ).collect()
