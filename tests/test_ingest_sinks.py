"""Source/sink roundtrips the e2e suite doesn't cover: JSONL (the corpus
interchange format), ORC, and the partitioned parquet sink's pruning."""

from __future__ import annotations

from pyspark.sql import types as T

from harmonize_search_analyze_spark.sources.catalog import Catalog
from harmonize_search_analyze_spark.sources.ingest import (
    read_jsonl,
    read_orc,
    write_jsonl,
)

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    rows = [(1, 'he said "hi"\nand left', "en"), (2, "straße—ünïcode", "de"),
            (3, None, "fr")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=DOC_SCHEMA)
    assert back.schema == DOC_SCHEMA   # no inference drift
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    path = str(tmp_path / "orc_out")
    df.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    """save_parquet(partition_by=...) must yield directory partitioning the
    scan actually prunes on (the 100 TB global-time-filter design)."""
    cat = Catalog(spark)
    df = spark.createDataFrame(
        [(i, ["baltimore", "detroit"][i % 2], i * 1.0) for i in range(20)],
        ["id", "city", "v"],
    )
    path = str(tmp_path / "part_out")
    cat.save_parquet(df, path, partition_by=["city"])
    back = spark.read.parquet(path)
    q = back.where(back.city == "baltimore")
    assert q.count() == 10
    plan = q._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # partition filter, not a data filter: pruned at planning time
    assert "PartitionFilters" in plan and "baltimore" in plan


def test_catalog_aliases(spark):
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("la_harmonized", spark.createDataFrame(
        [(1, "LA", "theft")], ["id", "city", "crime"]))
    cat.register("bmore_harmonized", spark.createDataFrame(
        [(2, "BAL", "assault")], ["id", "city", "crime"]))
    # plain alias over a pattern — lazily resolved
    cat.create_alias("crimes", "*_harmonized")
    assert cat.resolve("crimes").count() == 2
    # indices registered AFTER alias creation are included (ES behavior)
    cat.register("sf_harmonized", spark.createDataFrame(
        [(3, "SF", "theft")], ["id", "city", "crime"]))
    assert cat.resolve("crimes").count() == 3
    assert cat.aliases() == {"crimes": "*_harmonized"}
    # filtered alias: a query-DSL slice
    cat.create_alias("thefts", "*_harmonized",
                     filter={"term": {"crime": "theft"}})
    got = sorted(r.id for r in cat.resolve("thefts").collect())
    assert got == [1, 3]
    # collisions both directions
    import pytest
    with pytest.raises(ValueError):
        cat.create_alias("la_harmonized", "*")
    with pytest.raises(ValueError):
        cat.register("crimes", spark.range(1))
    cat.drop_alias("thefts")
    with pytest.raises(KeyError):
        cat.resolve("thefts")


def test_catalog_alias_cycle_raises(spark):
    import pytest
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.create_alias("a", "b")
    cat.create_alias("b", "a")
    with pytest.raises(ValueError, match="cycle"):
        cat.resolve("a")


def test_avro_gate_raises_with_env_var_guidance(spark, tmp_path):
    """S9: without spark-avro on the classpath read_avro must raise the
    documented gate error, which names BOTH escape hatches (the maven
    coordinate and the $SPARK_GRAFT_AVRO_JAR local-jar path wired through
    session.get_spark)."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.sources.ingest import read_avro

    with _pytest.raises(NotImplementedError, match="SPARK_GRAFT_AVRO_JAR"):
        read_avro(spark, str(tmp_path / "x.avro"))


def test_find_spark_avro_jar_probe(tmp_path, monkeypatch):
    """The S9 gate's bundled-jar probe: explicit env var wins; then a
    $SPARK_HOME/jars hit; with neither present it reports absence."""
    from harmonize_search_analyze_spark.session import find_spark_avro_jar

    monkeypatch.setenv("SPARK_GRAFT_AVRO_JAR", "/explicit/spark-avro.jar")
    assert find_spark_avro_jar() == "/explicit/spark-avro.jar"

    monkeypatch.delenv("SPARK_GRAFT_AVRO_JAR", raising=False)
    jars = tmp_path / "jars"
    jars.mkdir()
    jar = jars / "spark-avro_2.13-4.0.0.jar"
    jar.write_bytes(b"PK")
    monkeypatch.setenv("SPARK_HOME", str(tmp_path))
    assert find_spark_avro_jar() == str(jar)

    monkeypatch.setenv("SPARK_HOME", str(tmp_path / "empty"))
    assert find_spark_avro_jar() is None


def test_save_parquet_bloom_and_sorted(spark, tmp_path):
    """Bloom-filter writing is observable as footer growth shaped by the
    declared NDV; sort_within_partitions orders rows per file (min-max
    index discrimination) without adding an exchange."""
    import glob
    import os

    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    df = spark.range(0, 100_000).selectExpr(
        "id", "cast(id % 997 as string) as k"
    ).repartition(2)
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloom")
    cat.save_parquet(df, plain)
    cat.save_parquet(
        df, bloomed, bloom_filter_ndv={"k": 1000}, bloom_max_bytes=16384
    )

    def total(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(p + "/*.parquet")
        )

    grew = total(bloomed) - total(plain)
    assert grew > 500, f"bloom filters not written (delta {grew})"
    # data survives identically
    assert spark.read.parquet(bloomed).count() == 100_000

    srt = str(tmp_path / "sorted")
    cat.save_parquet(df, srt, sort_within_partitions=["k"])
    import pyarrow.parquet as pq

    one = glob.glob(srt + "/*.parquet")[0]
    ks = pq.read_table(one, columns=["k"]).column("k").to_pylist()
    assert ks == sorted(ks)


def test_cat_indices_listing(spark):
    """_cat/indices: counts + field counts + aliases per matching
    index, one unioned metadata plan; empty pattern -> empty frame."""
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("idx_a", spark.createDataFrame([(1, "x")], ["id", "v"]))
    cat.register(
        "idx_b", spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    )
    cat.create_alias("current", "idx_b")
    rows = {r["index"]: r for r in cat.cat_indices("idx_*").collect()}
    assert rows["idx_a"].docs == 1 and rows["idx_a"].fields == 2
    assert rows["idx_b"].docs == 3 and rows["idx_b"].fields == 1
    assert list(rows["idx_b"].aliases) == ["current"]
    assert list(rows["idx_a"].aliases) == []
    assert cat.cat_indices("zzz*").count() == 0
