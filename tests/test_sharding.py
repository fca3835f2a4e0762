"""WebDataset sharding: deterministic assignment, manifest, tar writer
round-trip."""

from __future__ import annotations

import tarfile

import pytest

from harmonize_search_analyze_spark.operators.sharding import (
    assign_shards,
    shard_manifest,
    write_webdataset_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} " + "x" * (i % 7)) for i in range(23)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_assignment_deterministic_and_complete(docs):
    a = assign_shards(docs, "doc_id", docs_per_shard=5)
    rows = {r.doc_id: (r.shard_id, r.pos_in_shard) for r in a.collect()}
    again = {r.doc_id: (r.shard_id, r.pos_in_shard)
             for r in assign_shards(docs, "doc_id", docs_per_shard=5)
             .collect()}
    assert rows == again                      # deterministic
    assert len(rows) == 23
    # contiguous: shards 0..3 of size 5,5,5,5 and a 3-doc tail
    from collections import Counter

    sizes = Counter(s for s, _ in rows.values())
    assert sizes == {0: 5, 1: 5, 2: 5, 3: 5, 4: 3}
    for s in range(5):
        poss = sorted(p for sh, p in rows.values() if sh == s)
        assert poss == list(range(len(poss)))
    # a different seed reshuffles
    other = {r.doc_id: (r.shard_id, r.pos_in_shard)
             for r in assign_shards(docs, "doc_id", docs_per_shard=5,
                                    seed=7).collect()}
    assert other != rows
    with pytest.raises(ValueError):
        assign_shards(docs, "doc_id", docs_per_shard=0)


def test_manifest_and_tar_round_trip(docs, tmp_path):
    a = assign_shards(
        docs.withColumn("nbytes", __import__("pyspark.sql.functions",
                        fromlist=["length"]).length("text")),
        "doc_id", docs_per_shard=10,
    )
    man = {r.shard_id: (r.n_docs, r.total_bytes)
           for r in shard_manifest(a, size_col="nbytes").collect()}
    assert sum(n for n, _ in man.values()) == 23

    out = write_webdataset_shards(a, str(tmp_path / "wds"))
    written = out.collect()
    assert [r.shard_id for r in written] == [0, 1, 2]
    total = 0
    seen_ids = set()
    for r in written:
        with tarfile.open(r.path) as tar:
            members = tar.getmembers()
            assert len(members) == r.n_docs
            for m in members:
                doc_id = int(m.name.removesuffix(".txt"))
                seen_ids.add(doc_id)
                body = tar.extractfile(m).read().decode()
                assert body.startswith(f"document number {doc_id} ")
                assert m.mtime == 0
        total += r.n_docs
    assert total == 23 and len(seen_ids) == 23
