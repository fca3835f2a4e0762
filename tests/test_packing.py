"""Sequence-packing invariants the SQL-oracle gate can't express directly:
budget respected, order preserved, oversize isolation, determinism across
partition layouts, and utilization accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.packing import (
    pack_documents,
    pack_summary,
)


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, 100 + (i * 37) % 900) for i in range(200)]
    rows.append((1000, 5000))   # oversize: bigger than any test budget
    return spark.createDataFrame(rows, ["doc_id", "n_tok"])


def test_pack_respects_budget_and_order(sized):
    out = pack_documents(sized, "doc_id", "n_tok", 2000, n_shards=4)
    rows = out.collect()
    assert len(rows) == 201
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pack in by_pack.values():
        pack.sort(key=lambda r: r["pack_pos"])
        # contiguous 0-based positions
        assert [r["pack_pos"] for r in pack] == list(range(len(pack)))
        # doc order within a pack follows doc_id order
        ids = [r["doc_id"] for r in pack]
        assert ids == sorted(ids)
        fill = sum(r["n_units"] for r in pack)
        if not any(r["oversize"] for r in pack):
            assert fill <= 2000
    # the oversize doc is alone in its pack and flagged
    big = [r for r in rows if r["doc_id"] == 1000][0]
    assert big["oversize"]
    assert len(by_pack[big["pack_id"]]) == 1


def test_pack_greedy_boundary(spark):
    """A doc that would overflow closes the pack — even when a later doc
    would still have fit (first-fit-contiguous, not bin-packing)."""
    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 40)], ["doc_id", "n_tok"]
    )
    out = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in
           pack_documents(df, "doc_id", "n_tok", 100, n_shards=1).collect()}
    assert out[1][0] == out[3][0] is not None and out[2][0] != out[1][0] \
        or True  # layout depends on shard hash order — assert via fills:
    packs = {}
    for doc, (pid, pos) in out.items():
        packs.setdefault(pid, []).append(doc)
    sizes = {tuple(sorted(v)) for v in packs.values()}
    # greedy over id order 1,2,3 with budget 100: [1]+[2,3]? 60+50>100 so
    # pack0=[1], then 50+40<=100 -> pack1=[2,3]
    assert sizes == {(1,), (2, 3)}


def test_pack_deterministic_across_layout(sized):
    a = sorted(tuple(r) for r in
               pack_documents(sized, "doc_id", "n_tok", 2000).collect())
    b = sorted(tuple(r) for r in
               pack_documents(sized.repartition(13), "doc_id", "n_tok",
                              2000).collect())
    assert a == b


def test_pack_summary_waste(spark):
    df = spark.createDataFrame([(1, 60), (2, 50), (3, 40)],
                               ["doc_id", "n_tok"])
    packed = pack_documents(df, "doc_id", "n_tok", 100, n_shards=1)
    s = {r["pack_id"]: r for r in pack_summary(packed, 100).collect()}
    waves = sorted((r["n_docs"], r["fill"], r["waste"]) for r in s.values())
    assert waves == [(1, 60, 40), (2, 90, 10)]


def test_pack_validation(sized):
    with pytest.raises(ValueError):
        pack_documents(sized, "doc_id", "n_tok", 0)
    with pytest.raises(ValueError):
        pack_documents(sized, "doc_id", "n_tok", 100, n_shards=0)


def test_fim_transform_reassembles_and_is_map_only(spark):
    """FIM property: for transformed rows, the three PSM segments
    reassemble the original text exactly (prefix+middle+suffix partition
    the doc); untransformed rows pass through; the plan is map-only; and
    the gate rate tracks fim_rate."""
    from harmonize_search_analyze_spark.operators.packing import (
        fim_transform,
    )

    rows = [(i, f"doc {i} " + "word " * (i % 11)) for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = fim_transform(docs, fim_rate=0.5)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    got = {r["doc_id"]: r for r in out.collect()}
    orig = dict(rows)
    applied = 0
    for i, r in got.items():
        if not r["fim_applied"]:
            assert r["sample"] == orig[i]
            continue
        applied += 1
        s = r["sample"]
        assert s.startswith("<PRE>")
        pre, rest = s[len("<PRE>"):].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == orig[i], (i, s)
    assert 0.35 < applied / len(rows) < 0.65  # hash gate tracks the rate


def test_fim_transform_deterministic(spark):
    from harmonize_search_analyze_spark.operators.packing import (
        fim_transform,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    a = fim_transform(docs).collect()
    b = fim_transform(docs).collect()
    assert a == b


def test_span_corruption_invertible_and_single_exchange(spark):
    """Properties: (1) replacing each input sentinel with its target span
    reconstructs the original token sequence; (2) sentinels are numbered
    0..n_spans-1 in order; (3) the plan carries ONE doc-keyed exchange
    (window + reassembly agg share the partitioning)."""
    import re

    from harmonize_search_analyze_spark.operators.packing import (
        span_corruption,
    )

    rows = [(i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = span_corruption(docs, mask_rate=0.3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan
    orig = dict(rows)
    some_masked = False
    for r in out.collect():
        # parse target into {sentinel: span tokens}
        tgt = re.split(r"(<extra_id_\d+>)", r["target"])
        spans = {}
        for j in range(1, len(tgt), 2):
            spans[tgt[j]] = tgt[j + 1].strip()
        assert list(spans) == [f"<extra_id_{k}>" for k in range(r["n_spans"])]
        rebuilt = " ".join(
            spans[t] if t in spans else t
            for t in r["input_masked"].split(" ")
            if t != "" or r["input_masked"] == ""
        )
        assert rebuilt.split() == orig[r["doc_id"]].split(), (
            r["doc_id"], r["input_masked"], r["target"])
        some_masked = some_masked or r["n_spans"] > 0
    assert some_masked


def test_prefix_lm_split_partitions_text(spark):
    from harmonize_search_analyze_spark.operators.packing import (
        prefix_lm_split_sql,
    )

    rows = [(i, f"document number {i} with some words") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    inp, tgt = prefix_lm_split_sql("doc_id", "text", "spark")
    got = docs.selectExpr("doc_id", "text", f"{inp} AS i", f"{tgt} AS t").collect()
    fracs = []
    for r in got:
        assert r["i"] + r["t"] == r["text"]
        fracs.append(len(r["i"]) / len(r["text"]))
    # cut index is floor-quantized, so the realized fraction can undershoot
    # min_prefix_frac by up to 1/len
    assert 0.2 <= min(fracs) and max(fracs) <= 0.8
    assert max(fracs) - min(fracs) > 0.1  # the cut actually varies


def test_denoiser_mix_routes_and_tags(spark):
    from harmonize_search_analyze_spark.operators.packing import (
        denoiser_mix,
    )

    rows = [(i, " ".join(f"tok{i}x{j}" for j in range(10)))
            for i in range(120)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = denoiser_mix(docs).collect()
    assert len(out) == 120                      # each doc exactly once
    by_tag = {}
    for r in out:
        by_tag.setdefault(r["denoiser"], []).append(r)
    assert set(by_tag) == {"[R]", "[X]", "[S]"}
    for tag, rs in by_tag.items():
        assert len(rs) > 20                     # hash routing ~ 1/3 each
    # [X] (rate .5) must mask more than [R] (rate .15) on average
    import re

    def masked_frac(rs):
        tot = sum(len(r["target"].split()) - len(
            re.findall(r"<extra_id_\d+>", r["target"])) for r in rs)
        n = sum(10 for _ in rs)
        return tot / n

    assert masked_frac(by_tag["[X]"]) > masked_frac(by_tag["[R]"]) + 0.1


def test_batch_by_length_invariants(spark):
    """batch_by_length: every batch is within one bucket, no batch
    exceeds batch_size, positions are dense from 0, exactly the
    under-filled last-per-shard batches are flagged runts, and the
    assignment is deterministic."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length,
    )

    rows = [(i, 10 + (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    out = batch_by_length(
        df, "doc_id", "n", boundaries=[100, 250], batch_size=8, n_shards=4
    ).collect()
    assert len(out) == 200

    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_key, []).append(r)
    for key, members in by_batch.items():
        assert len(members) <= 8
        assert {m.bucket for m in members} == {int(key.split("/")[0])}
        assert sorted(m.pos_in_batch for m in members) == list(
            range(len(members))
        )
        runt = {m.is_runt for m in members}
        assert len(runt) == 1  # runt flag is per-batch uniform
        if len(members) < 8:
            assert runt == {True}

    # deterministic across runs
    again = batch_by_length(
        df, "doc_id", "n", boundaries=[100, 250], batch_size=8, n_shards=4
    ).collect()
    assert sorted((r.doc_id, r.batch_key, r.pos_in_batch) for r in out) == \
        sorted((r.doc_id, r.batch_key, r.pos_in_batch) for r in again)

    # bucket bound: batch length spread never crosses a boundary
    for members in by_batch.values():
        b = members[0].bucket
        lo = [0, 101, 251][b]
        hi = [100, 250, 10**9][b]
        assert all(lo <= m.n <= hi for m in members)

    with _pytest.raises(ValueError):
        batch_by_length(df, "doc_id", "n", boundaries=[], batch_size=8)
    with _pytest.raises(ValueError):
        batch_by_length(df, "doc_id", "n", boundaries=[5, 3], batch_size=8)
    with _pytest.raises(ValueError):
        batch_by_length(df, "doc_id", "n", boundaries=[5], batch_size=0)


def test_batch_by_length_rejects_reserved_column_names(spark):
    """Review finding: reserved output/internal names as id/length
    columns must be rejected in BOTH twins, not silently shadowed."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length,
        batch_by_length_sql,
    )

    df = spark.createDataFrame([(1, 5)], ["doc_id", "shard"])
    with _pytest.raises(ValueError, match="collide"):
        batch_by_length(df, "doc_id", "shard", boundaries=[4], batch_size=2)
    with _pytest.raises(ValueError, match="collide"):
        batch_by_length_sql("t", "doc_id", "bucket",
                            boundaries=[4], batch_size=2)
    with _pytest.raises(ValueError, match="collide"):
        batch_by_length_sql("t", "batch_key", "n_chars",
                            boundaries=[4], batch_size=2)
