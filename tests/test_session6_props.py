"""Property tests for the session-6 operators (hypothesis):

- analyzer chains: edge_ngram emits only prefixes within gram bounds;
  shingle count law (max(n-k+1, 0) per order, + unigrams); unique is
  idempotent and order-preserving — all checked via the PYTHON reference
  below against the engine expression on random texts.
- grok/dissect: compile-then-match round-trips on composed inputs.
- viterbi: segmentation concatenates to the input; its score is >= any
  greedy segmentation's score under the same model.
- pr_curve: as the threshold decreases, tp and fp are non-decreasing and
  recall is non-decreasing; final recall is 1 when positives exist.
"""

from __future__ import annotations

import math

import pytest
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcdeXY01", min_size=1, max_size=8),
    min_size=0, max_size=8,
)


def _spark_tokens(spark, text, **chain):
    from harmonize_search_analyze_spark.functions.analyze import analyze

    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(analyze("t", **chain).alias("x")).collect()[0].x


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_words, st.integers(1, 3), st.integers(3, 6))
@pytest.mark.slow
def test_edge_ngram_prefix_law(spark, words, lo, hi):
    text = " ".join(words)
    got = _spark_tokens(
        spark, text,
        filters=[("edge_ngram", {"min_gram": lo, "max_gram": hi})],
    )
    toks = [w for w in re.split(r"[^A-Za-z0-9]+", text) if w]
    want = [w[:n] for w in toks for n in range(lo, hi + 1) if n <= len(w)]
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_words, st.integers(2, 3), st.booleans())
@pytest.mark.slow
def test_shingle_count_law(spark, words, n, unigrams):
    text = " ".join(words)
    got = _spark_tokens(
        spark, text,
        filters=[("shingle", {"min_shingle_size": n, "max_shingle_size": n,
                              "output_unigrams": unigrams})],
    )
    toks = [w for w in re.split(r"[^A-Za-z0-9]+", text) if w]
    expect = (toks if unigrams else []) + [
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    ]
    assert got == expect


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_words)
@pytest.mark.slow
def test_unique_idempotent_order_preserving(spark, words):
    text = " ".join(words)
    once = _spark_tokens(spark, text, filters=["unique"])
    twice = _spark_tokens(spark, text, filters=["unique", "unique"])
    assert once == twice
    toks = [w for w in re.split(r"[^A-Za-z0-9]+", text) if w]
    seen, want = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            want.append(t)
    assert once == want


@settings(max_examples=50, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.text(alphabet="abc XY=,:", min_size=0, max_size=20),
       st.text(alphabet="abc09", min_size=1, max_size=6))
def test_dissect_round_trip(prefix, tail):
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        dissect_to_regex,
    )

    line = prefix + "|" + tail
    rx, fields = dissect_to_regex("%{head}|%{rest}")
    assert fields == ["head", "rest"]
    m = re.match(rx, line)
    # final key greedy: head takes up to the FIRST pipe (lazy)
    assert m.group(1) == prefix.split("|")[0]
    assert line == m.group(1) + "|" + m.group(2)


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.sampled_from(["ab", "abc", "a", "b", "c", "bc"]),
                min_size=1, max_size=6))
def test_viterbi_concatenation_and_optimality(pieces):
    from harmonize_search_analyze_spark.operators.unigram import _viterbi

    word = "".join(pieces)
    logp = {"a": math.log(0.2), "b": math.log(0.15), "c": math.log(0.1),
            "ab": math.log(0.3), "bc": math.log(0.15), "abc": math.log(0.1)}
    seg = _viterbi(word, logp, 3)
    assert seg is not None and "".join(seg) == word
    score = sum(logp[p] for p in seg)
    # greedy longest-first reference must never beat Viterbi
    i, greedy = 0, []
    while i < len(word):
        for n in (3, 2, 1):
            if word[i:i + n] in logp:
                greedy.append(word[i:i + n])
                i += n
                break
    gscore = sum(logp[p] for p in greedy)
    assert score >= gscore - 1e-12


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 5), st.booleans()),
                min_size=1, max_size=30))
@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
def test_pr_curve_monotonicity(spark, rows):
    from harmonize_search_analyze_spark.operators.analytics import pr_curve

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in rows], ["score", "y"]
    )
    out = pr_curve(df, "score", "y").collect()
    tps = [r.tp for r in out]
    fps = [r.fp for r in out]
    assert tps == sorted(tps) and fps == sorted(fps)
    recalls = [r.recall for r in out if r.recall is not None]
    assert recalls == sorted(recalls)
    n_pos = sum(y for _, y in rows)
    if n_pos:
        assert out[-1].recall == 1.0
        assert out[-1].tp == n_pos


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 60 * 24 * 6 - 1), min_size=1, max_size=40),
       st.sampled_from(["1 hour", "2 hours", "6 hours", "1 day"]),
       st.sampled_from(["15 minutes", "1 hour", "3 hours"]))
@pytest.mark.slow
def test_rollup_rewrite_always_equals_raw(spark, minutes, interval, grain):
    """For ANY data and any registered dividing grain, the rewritten
    answer equals the raw-scan answer exactly; non-dividing grains fall
    back to raw (also exact by construction)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.aggregations import (
        _grain_seconds,
        date_histogram,
        rollup_rewrite,
    )

    base = dt.datetime(2025, 3, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(minutes=m),) for m in minutes], ["ts"]
    )
    rollups = {grain: date_histogram(df, "ts", grain)}
    out, src = rollup_rewrite(df, "ts", interval, rollups)
    want_src = (
        grain
        if _grain_seconds(interval) % _grain_seconds(grain) == 0
        else "raw"
    )
    assert src == want_src
    want = sorted(
        (r.bucket, r.doc_count)
        for r in date_histogram(df, "ts", interval).collect()
    )
    assert sorted((r.bucket, r.doc_count) for r in out.collect()) == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100),
                          st.sampled_from(["a", "b", "c"])),
                min_size=0, max_size=40))
@pytest.mark.slow
def test_step_transitions_conservation(spark, rows):
    """Edge conservation: total transitions == Σ per-user max(n_i - 1, 0)
    over users with distinct (ts, event) multisets as generated."""
    import datetime as dt
    from collections import Counter

    from harmonize_search_analyze_spark.operators.analytics import (
        step_transitions,
    )

    base = dt.datetime(2025, 1, 1)
    data = [(u, base + dt.timedelta(minutes=m), e) for u, m, e in rows]
    if not data:
        return
    df = spark.createDataFrame(data, ["uid", "ts", "ev"])
    got = step_transitions(df, "uid", "ts", "ev", k=10**6).collect()
    per_user = Counter(u for u, _, _ in rows)
    want_total = sum(max(n - 1, 0) for n in per_user.values())
    assert sum(r.transitions for r in got) == want_total
