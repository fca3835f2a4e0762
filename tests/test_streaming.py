"""Structured Streaming tests: file-source micro-batches over the events
table, windowed agg with watermark vs the batch twin, foreachBatch dashboard
refresh, and the session_window sessionizer vs its batch oracle (the
stateful-processor path is gated: see streaming/windows.py docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.sources.tables import load_table
from harmonize_search_analyze_spark.streaming.windows import (
    EVENTS_SCHEMA,
    dashboard_refresh,
    read_document_stream,
    sessionize,
    sessionize_batch,
    sessionize_stream,
    stateful_api_available,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Stage the events table as 3 parquet files so the file source replays
    them as 3 micro-batches (the bulk-index appends)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(3).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_windowed_counts_matches_batch(spark, events_stream_dir, tmp_path):
    stream = read_document_stream(spark, events_stream_dir, EVENTS_SCHEMA)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["window_start"]: (r["cnt"], r["avg_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = load_table(spark, SF_DIR, "events")
    expect = {
        r["window_start"]: (r["cnt"], r["avg_value"])
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "cnt", "avg_value")
        .collect()
    }
    assert got == expect


def test_sliding_window_shape(spark, events_stream_dir, tmp_path):
    stream = read_document_stream(spark, events_stream_dir, EVENTS_SCHEMA)
    agg = windowed_counts(
        stream, window="2 hours", slide="1 hour", watermark="5 minutes",
        value_col=None,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM slide_counts").collect()
    assert rows and all(r["cnt"] > 0 for r in rows)
    # sliding windows: every event lands in ~2 windows
    total_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["cnt"] for r in rows) == pytest.approx(2 * total_events, rel=0.02)


@pytest.mark.slow
def test_dashboard_refresh_foreachbatch(spark, events_stream_dir, tmp_path):
    from harmonize_search_analyze_spark.operators.aggregations import (
        count_metric,
        terms,
    )

    stream = read_document_stream(spark, events_stream_dir, EVENTS_SCHEMA)
    seen: dict[str, list] = {"total": [], "by_type": []}

    def sink(name, df, batch_id):
        seen[name].append((batch_id, df.collect()))

    q = dashboard_refresh(
        stream,
        panels={
            "total": lambda d: count_metric(d),
            "by_type": lambda d: terms(d, "event_type", k=5),
        },
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 3 staged files -> 3 micro-batch refreshes, each running every panel
    assert len(seen["total"]) == 3 and len(seen["by_type"]) == 3
    streamed_total = sum(b[0]["doc_count"] for _, b in seen["total"])
    assert streamed_total == load_table(spark, SF_DIR, "events").count()


@pytest.mark.slow
def test_sessionize_stream_matches_batch_oracle(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, minute, val):
        return (eid, base + dt.timedelta(minutes=minute), uid, "click", val)

    rows = [
        # user 1: two sessions separated by a 60-min gap (gap=30min)
        ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 20, 3.0),
        ev(4, 1, 80, 4.0), ev(5, 1, 85, 5.0),
        # user 2: one session
        ev(6, 2, 0, 10.0), ev(7, 2, 29, 20.0),
    ]
    src = tmp_path / "sess_src"
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(src))
    # a second batch far in the future closes every open session on replay
    late = [ev(99, 1, 600, 0.5), ev(98, 2, 600, 0.5)]
    spark.createDataFrame(late, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = read_document_stream(spark, str(src), EVENTS_SCHEMA)
    out = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # only CLOSED sessions emit (append mode: watermark passed end + gap);
    # the 600-min events' sessions stay open, never emitted
    expect = {
        (1, base): (3, 6.0),
        (1, base + dt.timedelta(minutes=80)): (2, 9.0),
        (2, base): (2, 30.0),
    }
    assert got == expect

    # batch oracle agrees on the same closed sessions
    batch = sessionize_batch(df, gap_seconds=1800)
    got_b = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got_b == expect


def test_sessionize_stateful_api_gate(spark):
    """The arbitrary-stateful path: runs when the environment has protobuf,
    otherwise must fail loudly (NotImplementedError), never silently."""
    if stateful_api_available():
        stream = read_document_stream(
            spark, "/tmp/nonexistent_ok_lazy", EVENTS_SCHEMA
        )
        out = sessionize(stream, gap_seconds=60)
        assert out.isStreaming
    else:
        import pytest as _pytest

        dummy = spark.readStream.format("rate").load().selectExpr(
            "value AS event_id", "timestamp AS ts", "value AS user_id",
            "'x' AS event_type", "CAST(value AS DOUBLE) AS value",
        )
        with _pytest.raises(NotImplementedError):
            sessionize(dummy, gap_seconds=60)


def test_sessionize_batch_on_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = sessionize_batch(ev, gap_seconds=3600)
    agg = out.agg(
        F.sum("n_events").alias("n"),
        F.count(F.lit(1)).alias("sessions"),
    ).collect()[0]
    assert agg["n"] == ev.count()          # every event in exactly one session
    assert 0 < agg["sessions"] <= ev.count()


@pytest.mark.slow
def test_streaming_crime_dashboard_refresh(spark, tmp_path):
    """Layers composed: harmonized-shaped stream -> foreachBatch ->
    the reference's five dashboard panels per micro-batch."""
    import datetime as dt

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.dashboards import (
        crime_dashboard,
    )

    schema = T.StructType([
        T.StructField("description", T.StringType()),
        T.StructField("dayofweek", T.StringType()),
        T.StructField("hour", T.IntegerType()),
        T.StructField("city", T.StringType()),
        T.StructField("notebookhtml", T.StringType()),
        T.StructField("geolocation", T.StringType()),
        T.StructField("datetime", T.TimestampType()),
    ])
    rows = [
        ("Assault", "Monday", 18, "baltimore", "b.html", "39.28,-76.62",
         dt.datetime(2017, 4, 5, 18, 0)),
        ("Theft", "Monday", 19, "detroit", "d.html", "42.40,-83.10",
         dt.datetime(2017, 4, 5, 19, 0)),
        ("Assault", "Tuesday", 9, "baltimore", "b.html", "39.30,-76.61",
         dt.datetime(2017, 4, 6, 9, 0)),
    ]
    src = tmp_path / "harmonized_stream"
    spark.createDataFrame(rows, schema).repartition(2).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = read_document_stream(spark, str(src), schema)
    collected: dict[int, dict] = {}

    def sink(name, df, batch_id):
        collected.setdefault(batch_id, {})[name] = df.collect()

    q = dashboard_refresh(
        stream,
        panels={
            name: fn
            for name, fn in {
                "description_pie": lambda d: crime_dashboard(d)["description_pie"],
                "incident_map": lambda d: crime_dashboard(d)["incident_map"],
            }.items()
        },
        sink=sink,
        checkpoint_dir=str(tmp_path / "ck_dash"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # every micro-batch refreshed every panel; totals across batches match
    total_descr = sum(
        r["doc_count"]
        for b in collected.values() for r in b["description_pie"]
    )
    total_geo = sum(
        r["doc_count"] for b in collected.values() for r in b["incident_map"]
    )
    assert total_descr == 3 and total_geo == 3
    hashes = {r["geohash"] for b in collected.values() for r in b["incident_map"]}
    assert hashes == {"dq", "dp"}


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """Streaming exact-dedup twin: re-delivered (duplicate-key) events across
    micro-batches are dropped; result matches the batch dropDuplicates."""
    from harmonize_search_analyze_spark.streaming.windows import dedup_stream

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(200)
        .cache()
    )
    d = tmp_path / "dup_stream"
    # batch 1: the originals; batch 2: half of them re-delivered verbatim.
    ev.coalesce(1).write.mode("overwrite").parquet(str(d))
    ev.limit(100).coalesce(1).write.mode("append").parquet(str(d))

    stream = read_document_stream(spark, str(d), EVENTS_SCHEMA)
    deduped = dedup_stream(stream, keys=["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == ev.count()  # each id exactly once
    assert set(ids) == {r["event_id"] for r in ev.collect()}


def test_session_boundary_gap_exactly_equal(spark):
    """ADVICE r1: an event arriving exactly gap_seconds after the previous
    one must START a new session on every path (session_window's end is
    exclusive). Drives SessionProcessor.handleInputRows directly with a fake
    state handle and pins it to the batch twin."""
    import datetime as dt

    import pandas as pd

    from harmonize_search_analyze_spark.streaming.windows import (
        SessionProcessor,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def clear(self):
            self._v = None

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeState()

        def getValueState(self, name, schema):
            return self.state

        def listTimers(self):
            return []

        def deleteTimer(self, t):
            pass

        def registerTimer(self, t):
            pass

    class _FakeTimers:
        def getCurrentProcessingTimeInMs(self):
            return 0

    class _FakeExpired:
        pass

    base = dt.datetime(2024, 1, 1)
    for offset_s, want_sessions in [(1800, 2), (1799, 1), (1801, 2)]:
        events = [(base, 1.0), (base + dt.timedelta(seconds=offset_s), 2.0)]

        proc = SessionProcessor(gap_seconds=1800)
        handle = _FakeHandle()
        proc.init(handle)
        pdf = pd.DataFrame({"ts": [e[0] for e in events],
                            "value": [e[1] for e in events]})
        out = list(proc.handleInputRows((1,), iter([pdf]), _FakeTimers()))
        out += list(proc.handleExpiredTimer((1,), _FakeTimers(), _FakeExpired()))
        n_proc = sum(len(p) for p in out)

        df = spark.createDataFrame(
            [(1, t, v) for t, v in events], "user_id LONG, ts TIMESTAMP, value DOUBLE"
        )
        n_batch = sessionize_batch(df, gap_seconds=1800).count()
        assert n_proc == n_batch == want_sessions, (
            f"offset {offset_s}s: processor {n_proc}, batch {n_batch}, "
            f"want {want_sessions}"
        )


def test_enrich_stream_static_join(spark, events_stream_dir, tmp_path):
    """Stream-static enrichment: every micro-batch left-joins the static
    dim (broadcast, stateless); output equals the batch join."""
    from harmonize_search_analyze_spark.streaming.windows import (
        enrich_stream,
    )

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue")],
        ["event_type", "category"],
    )
    stream = read_document_stream(spark, events_stream_dir, EVENTS_SCHEMA)
    enriched = enrich_stream(stream, dim, "event_type")
    assert enriched.isStreaming
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_events")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT category, COUNT(*) AS n FROM enriched_events GROUP BY 1"
    ).collect()
    batch = (
        load_table(spark, SF_DIR, "events")
        .join(dim, "event_type", "left")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r["category"], r["n"]) for r in got} == \
        {(r["category"], r["n"]) for r in batch}
    # total preserved (left join: unmatched stream rows survive, null cat)
    assert sum(r["n"] for r in got) == \
        load_table(spark, SF_DIR, "events").count()

    with pytest.raises(ValueError, match="inner/left"):
        enrich_stream(stream, dim, "event_type", how="full")


def test_join_streams_time_bounded(spark, tmp_path):
    """Stream-stream join with event-time bound matches the equivalent
    batch join; out-of-window clicks don't match."""
    import pandas as pd

    from harmonize_search_analyze_spark.streaming.windows import (
        join_streams,
        read_document_stream,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    imps = [(1, base), (2, base + pd.Timedelta(minutes=5))]
    clicks = [
        (1, base + pd.Timedelta(minutes=2)),     # in window
        (1, base - pd.Timedelta(minutes=1)),     # before impression: no
        (2, base + pd.Timedelta(minutes=20)),    # past max_delay: no
    ]
    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clicks"
    imp_dir.mkdir(), clk_dir.mkdir()
    # microsecond timestamps: pandas defaults to nanos, which Spark's
    # streaming parquet reader rejects (same gotcha as events.parquet)
    pd.DataFrame(imps, columns=["ad_id", "imp_ts"]).to_parquet(
        imp_dir / "p.parquet", coerce_timestamps="us")
    pd.DataFrame(clicks, columns=["ad_id", "click_ts"]).to_parquet(
        clk_dir / "p.parquet", coerce_timestamps="us")

    imp_s = read_document_stream(
        spark, str(imp_dir), "ad_id BIGINT, imp_ts TIMESTAMP")
    clk_s = read_document_stream(
        spark, str(clk_dir), "ad_id BIGINT, click_ts TIMESTAMP")
    joined = join_streams(
        imp_s, clk_s, "ad_id", left_ts="imp_ts", right_ts="click_ts",
        max_delay_seconds=600,
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory").queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [(r["ad_id"], r["imp_ts"], r["click_ts"])
           for r in spark.sql("SELECT * FROM attrib").collect()]
    assert got == [(1, imps[0][1].to_pydatetime(),
                    clicks[0][1].to_pydatetime())]

    with pytest.raises(ValueError, match="inner/left_outer"):
        join_streams(imp_s, clk_s, "ad_id", left_ts="imp_ts",
                     right_ts="click_ts", how="full")


def test_streaming_percolate_alerts(spark, tmp_path):
    """percolate() is a stateless codegen'd projection, so the SAME
    operator runs unchanged on a stream — the saved-search alerting path
    (stored queries fire per micro-batch as events land)."""
    import datetime as dt

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.plans.compiler import percolate

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rows = [
        (1, "purchase", 500.0, dt.datetime(2025, 1, 1, 10)),
        (2, "error", 1.0, dt.datetime(2025, 1, 1, 10, 1)),
        (3, "view", 5.0, dt.datetime(2025, 1, 1, 10, 2)),
        (4, "purchase", 10.0, dt.datetime(2025, 1, 1, 10, 3)),
    ]
    src = tmp_path / "event_stream"
    spark.createDataFrame(rows, schema).repartition(2).write.mode(
        "overwrite"
    ).parquet(str(src))

    stored = {
        "big_purchase": {"bool": {"must": [
            {"match": {"event_type": "purchase"}},
            {"range": {"value": {"gte": 100}}},
        ]}},
        "any_error": {"match": {"event_type": "error"}},
    }
    stream = read_document_stream(spark, str(src), schema)
    alerts = percolate(stream, stored, ["event_id"])
    assert alerts.isStreaming
    q = (
        alerts.writeStream.format("memory")
        .queryName("percolate_alerts")
        .option("checkpointLocation", str(tmp_path / "ck_perc"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["event_id"], r["query_id"])
        for r in spark.sql("SELECT * FROM percolate_alerts").collect()
    )
    assert got == [(1, "big_purchase"), (2, "any_error")]


@pytest.mark.skipif(
    not stateful_api_available(),
    reason="transformWithStateInPandas unavailable: google.protobuf is not "
    "installed in this environment (its state-server protocol needs it) — "
    "the gap-session semantics are covered JVM-side by sessionize_stream; "
    "this skip exists so the uncovered custom-stateful path stays VISIBLE "
    "in every suite run (VERDICT r2 item 9)",
)
def test_stateful_processor_end_to_end(spark, tmp_path):
    """When the environment can run the arbitrary-stateful path, it must
    actually close sessions: two events 10s apart, gap 60s -> one session
    after the timer fires."""
    import datetime as dt
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    stream = read_document_stream(spark, src, EVENTS_SCHEMA)
    out = sessionize(stream, gap_seconds=1)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .start()
    )
    try:
        df = spark.createDataFrame(
            [(1, dt.datetime(2025, 1, 1, 0, 0, 0), 7, "view", 1.0),
             (2, dt.datetime(2025, 1, 1, 0, 0, 10), 7, "view", 2.0)],
            EVENTS_SCHEMA,
        )
        df.write.mode("append").parquet(src)
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM stateful_sessions").collect()
            if rows:
                break
            time.sleep(2)
        assert rows, "stateful processor emitted no closed sessions"
    finally:
        q.stop()


@pytest.mark.slow
def test_near_dup_stream_matches_batch_incremental(spark, tmp_path):
    """Streaming near-dup filter: micro-batches against persistent
    signature state must produce exactly the one-shot batch pair set,
    and the state must hold one signature row per distinct id."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.dedup import lsh_incremental
    from harmonize_search_analyze_spark.streaming.windows import (
        near_dup_stream,
    )

    texts = [
        (0, "alpha beta gamma delta"),
        (1, "epsilon zeta eta theta"),
        (2, "alpha beta gamma delta"),      # dup of 0, same file
        (3, "iota kappa lambda mu"),
        (4, "alpha beta gamma delta"),      # dup of 0/2, later file
        (5, "iota kappa lambda mu"),        # dup of 3, later file
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = tmp_path / "docs_stream"
    df = spark.createDataFrame(texts, schema)
    # two files -> two micro-batches (first 4 docs, then 2)
    df.where(F.col("doc_id") < 4).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    df.where(F.col("doc_id") >= 4).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = near_dup_stream(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "dups"),
        str(tmp_path / "ckpt"),
        n=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        frozenset((r["id_new"], r["id_prior"]))
        for r in spark.read.parquet(str(tmp_path / "dups")).collect()
    }
    one_shot, _ = lsh_incremental(df, None, "doc_id", "text", n=1)
    want = {
        frozenset((r["id_new"], r["id_prior"]))
        for r in one_shot.collect()
    }
    assert got == want and len(want) >= 3
    state = spark.read.parquet(str(tmp_path / "state"))
    assert state.count() == 6
    assert state.select("doc_id").distinct().count() == 6


@pytest.mark.slow
def test_bloom_dedup_stream_exact_history_dedup(spark, tmp_path):
    """Streaming Bloom-prefiltered exact dedup: across micro-batches the
    out sink holds exactly the first occurrence of every distinct text,
    matching the one-shot batch dedup; digest state is one row per key."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.streaming.windows import (
        bloom_dedup_stream,
    )

    texts = [
        (0, "alpha beta"),
        (1, "gamma delta"),
        (2, "alpha beta"),       # within-batch dup of 0
        (3, "epsilon zeta"),
        (4, "gamma delta"),      # cross-batch dup of 1
        (5, "eta theta"),
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = tmp_path / "bloom_stream_src"
    df = spark.createDataFrame(texts, schema)
    df.where(F.col("doc_id") < 4).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    df.where(F.col("doc_id") >= 4).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = bloom_dedup_stream(
        stream,
        str(tmp_path / "bstate"),
        str(tmp_path / "bout"),
        str(tmp_path / "bckpt"),
        m_bits=4096,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "bout"))
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 3, 5]
    digests = spark.read.parquet(str(tmp_path / "bstate/digests"))
    assert digests.count() == 4
    assert digests.distinct().count() == 4


def test_streaming_nb_scoring_matches_batch(spark, tmp_path):
    """Model-reuse contract: nb_train once in batch, score a document
    STREAM against the saved weights (stream-static equi-join on tok,
    scalar prior) — per-doc results must equal batch nb_score."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.classifier import (
        nb_score,
        nb_train,
    )

    rows = [
        (i,
         ("clean prose sentence structure" if i % 3 else "spam click buy"),
         "good" if i % 3 else "bad")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    weights, prior_df = nb_train(docs, "source = 'good'")
    prior_val = prior_df.collect()[0]["prior"]  # model metadata, 1 row
    weights = weights.cache()

    batch = {r["doc_id"]: (r["logit"], r["pred_quality"])
             for r in nb_score(docs, weights, prior_val).collect()}

    d = tmp_path / "docs_stream"
    docs.select("doc_id", "text").repartition(3).write.parquet(str(d))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    assert stream.isStreaming
    out = nb_score(stream, weights, prior_val)
    q = (
        out.writeStream.format("memory")
        .queryName("nb_stream_scores")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["logit"], r["pred_quality"])
               for r in spark.sql(
                   "SELECT * FROM nb_stream_scores").collect()}
    finally:
        q.stop()
    assert got == batch
    weights.unpersist()


def test_streaming_ingest_pipeline(spark, tmp_path):
    """Ingest-pipeline processors are stateless column transforms, so the
    SAME run_pipeline runs unchanged on a stream — the ES ingest-node
    shape (parse/convert/drop per document as micro-batches land)."""
    import datetime as dt

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("line", T.StringType()),
    ])
    rows = [
        (1, "INFO 2025-01-01T10:00:00 boot ok"),
        (2, "ERROR 2025-01-01T10:01:00 disk full"),
        (3, "not a log line"),
    ]
    src = tmp_path / "log_stream"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src)
    )
    stream = read_document_stream(spark, str(src), schema)
    out = run_pipeline(stream, [
        {"grok": {"field": "line",
                  "pattern": "%{LOGLEVEL:level} %{TIMESTAMP_ISO8601:at} "
                             "%{GREEDYDATA:msg}"}},
        {"drop": {"if": "level IS NULL"}},
        {"lowercase": {"field": "msg"}},
        {"date": {"field": "at", "formats": ["yyyy-MM-dd'T'HH:mm:ss"],
                  "target_field": "ts"}},
    ])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ingested_logs")
        .option("checkpointLocation", str(tmp_path / "ck_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: (r["level"], r["msg"], r["ts"])
        for r in spark.sql("SELECT * FROM ingested_logs").collect()
    }
    assert set(got) == {1, 2}  # the unparseable line was dropped
    assert got[2] == ("ERROR", "disk full",
                      dt.datetime(2025, 1, 1, 10, 1))


def test_streaming_kql_and_esql_map_commands(spark, tmp_path):
    """KQL predicates and the map-only ES|QL commands (WHERE/EVAL/KEEP)
    are stateless column transforms, so the same compilers run unchanged
    on a streaming frame — the Kibana-search-bar-over-a-stream shape."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.plans.kql import kql_query
    from harmonize_search_analyze_spark.sources.catalog import Catalog
    from harmonize_search_analyze_spark.streaming.windows import (
        read_document_stream,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("etype", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    rows = [(1, "click", 10.0), (2, "view", 300.0), (3, "click", 400.0)]
    src = tmp_path / "kql_stream"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src)
    )
    stream = read_document_stream(spark, str(src), schema)
    cat = Catalog(spark)
    cat.register("stream", stream)
    out = run_esql(cat, """
        FROM stream
        | WHERE v >= 200
        | EVAL flag = etype || '!'
        | KEEP id, flag
    """).where(kql_query("flag:click*"))
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("kql_esql_stream")
        .option("checkpointLocation", str(tmp_path / "ck_kql"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [(r.id, r.flag) for r in
           spark.sql("SELECT * FROM kql_esql_stream").collect()]
    assert got == [(3, "click!")]


def test_ingest_pipeline_runs_on_stream(spark, events_stream_dir, tmp_path):
    """The data-driven ingest pipeline (incl. the round-4 processors:
    bytes, fingerprint, user_agent, geoip) is map-only, so the SAME
    processor list runs unchanged on a streaming frame — stream output
    equals the batch run row-for-row."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    ranges = spark.createDataFrame(
        [("10.0.0.0", "10.1.255.255", "US"), ("10.2.0.0", "10.3.255.255", "EU")],
        ["start_ip", "end_ip", "country"],
    )
    pipeline = [
        {"script": {"target_field": "ip", "source": (
            "concat('10.', CAST(user_id % 4 AS STRING), '.0.1')")}},
        {"geoip": {"field": "ip", "ranges": ranges}},
        {"script": {"target_field": "sz",
                    "source": "concat(CAST(CAST(value AS INT) AS STRING), 'kb')"}},
        {"bytes": {"field": "sz", "target_field": "sz_bytes"}},
        {"fingerprint": {"fields": ["event_type", "country"],
                         "method": "MD5"}},
    ]
    stream = read_document_stream(spark, events_stream_dir, EVENTS_SCHEMA)
    out = run_pipeline(stream, pipeline).select(
        "event_id", "country", "sz_bytes", "fingerprint"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ingest_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ingest_stream").collect()
    )
    batch = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    want = sorted(
        tuple(r) for r in run_pipeline(batch, pipeline).select(
            "event_id", "country", "sz_bytes", "fingerprint"
        ).collect()
    )
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_streaming_sketches_match_batch(spark, tmp_path):
    """The mergeable sketches run UNCHANGED on a stream: Count-Min
    cells and HLL registers are plain groupBy aggs, so complete-mode
    streaming output over the same rows equals the batch sketch — the
    merge-by-addition / merge-by-MAX property is what makes the
    100 TB continuous-ingest shape free."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.aggregations import (
        countmin_sketch,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
    ])
    rows = [(i, f"t{i % 13}") for i in range(400)]
    src = tmp_path / "sketch_stream"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src)
    )
    batch_cells = {
        (r.r, r.c): r.n
        for r in countmin_sketch(
            spark.read.parquet(str(src)), "term", depth=4, width=32
        ).collect()
    }
    stream = read_document_stream(spark, str(src), schema)
    out = countmin_sketch(stream, "term", depth=4, width=32)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_cm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.r, r.c): r.n
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    assert got == batch_cells


@pytest.mark.slow
def test_streaming_downsample_matches_batch(spark, tmp_path):
    """TSDB downsampling runs UNCHANGED on a stream (complete mode):
    the continuous-rollup ingest shape — gauge pre-aggregates per
    (dims, bucket) equal the batch downsample over the same rows."""
    import datetime as dt

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.aggregations import (
        downsample,
    )

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ])
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        ("a", t0 + dt.timedelta(minutes=7 * i), float(i % 13))
        for i in range(200)
    ] + [
        ("b", t0 + dt.timedelta(minutes=11 * i), float(i % 7))
        for i in range(120)
    ]
    src = tmp_path / "ds_stream"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src)
    )
    batch = {
        (r.k, r.bucket): (r._doc_count, r.v_min, r.v_max, r.v_sum)
        for r in downsample(
            spark.read.parquet(str(src)), "ts", "1 hour",
            dims=["k"], gauges=["v"],
        ).collect()
    }
    stream = read_document_stream(spark, str(src), schema)
    out = downsample(stream, "ts", "1 hour", dims=["k"], gauges=["v"])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ds_rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_ds"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.bucket): (r._doc_count, r.v_min, r.v_max, r.v_sum)
        for r in spark.sql("SELECT * FROM ds_rollup").collect()
    }
    assert got == batch


@pytest.mark.slow
def test_streaming_hll_by_matches_batch(spark, tmp_path):
    """Per-group HLL registers are a plain (group, bucket, MAX rho)
    agg, so the sketch runs UNCHANGED on a stream (complete mode) and
    equals the batch estimates over the same rows — registers merge by
    MAX, the continuous distinct-per-segment shape."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.aggregations import (
        hll_cardinality_by,
        hll_registers_by,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("k", T.LongType()),
    ])
    rows = [(f"g{i % 3}", (i * 7919) % 500) for i in range(3000)]
    src = tmp_path / "hll_stream"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src)
    )
    batch = {
        r.g: r.estimate
        for r in hll_cardinality_by(
            spark.read.parquet(str(src)), "g", "k", p=10
        ).collect()
    }
    # the REGISTER stage streams (one agg); estimates are a batch view
    # over the streamed state — chained aggregations don't stream, and
    # the mergeable-register design means they don't need to
    stream = read_document_stream(spark, str(src), schema)
    regs = hll_registers_by(stream, "g", "k", p=10)
    assert regs.isStreaming
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM hll_regs")
    # estimator fold over the streamed registers (same arithmetic as
    # the batch operator's second stage)
    import math

    m = 1 << 10
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per = {}
    for r in streamed.collect():
        per.setdefault(r.grp, []).append(r.r)
    got = {}
    for g, rs in per.items():
        s2 = sum(2.0 ** -x for x in rs)
        nreg = len(rs)
        raw = alpha * m * m / (s2 + (m - nreg))
        zeros = m - nreg
        est = (
            m * math.log(m / zeros)
            if raw <= 2.5 * m and zeros > 0
            else raw
        )
        got[g] = round(est, 4)
    assert got == batch


@pytest.mark.slow
def test_scd2_upsert_stream_versions_dimension(spark, tmp_path):
    """Streaming SCD2 registry: two micro-batches (insert wave, then a
    mixed update/new wave) produce the same dimension as two sequential
    batch merges; rows absent from a batch stay open (partial-snapshot
    semantics)."""
    import datetime as dt

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.streaming.windows import (
        scd2_upsert_stream,
    )

    t = dt.datetime
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("seg", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    wave1 = [(1, "a", t(2025, 1, 1)), (2, "b", t(2025, 1, 1)),
             (2, "b2", t(2025, 1, 2))]     # in-batch newer version wins
    wave2 = [(2, "c", t(2025, 2, 1)), (3, "new", t(2025, 2, 1))]
    src = tmp_path / "src"
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    dim_path = str(tmp_path / "dim")
    q = scd2_upsert_stream(
        stream, dim_path, str(tmp_path / "ckpt"),
        id_col="id", tracked=["seg"], ts_col="ts",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r["id"], r["seg"], r["valid_to"] is None)
        for r in spark.read.parquet(dim_path).collect()
    }
    # id 1 untouched by wave 2 -> STILL OPEN (partial snapshot);
    # id 2: b2 closed, c open (b never materialized — in-batch collapse);
    # id 3 inserted open
    assert rows == {
        (1, "a", True),
        (2, "b2", False),
        (2, "c", True),
        (3, "new", True),
    }


def test_scd2_upsert_stream_replay_idempotent(spark, tmp_path):
    """Re-merging an already-applied batch (the foreachBatch replay
    case) is a no-op: data-derived as_of + close_missing=False."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.ordering import (
        scd2_merge,
    )

    t = dt.datetime
    dim = spark.createDataFrame(
        [(1, "a", t(2025, 1, 1), None), (2, "b", t(2025, 1, 1), None)],
        "id long, seg string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame([(2, "c")], "id long, seg string")
    once = scd2_merge(dim, batch, "id", ["seg"], "2025-02-01",
                      close_missing=False)
    twice = scd2_merge(once, batch, "id", ["seg"], "2025-02-01",
                       close_missing=False)
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))
    # and id 1 (absent from the batch) stayed open
    assert [r for r in once.collect()
            if r["id"] == 1][0]["valid_to"] is None


def test_kmv_cardinality_stream_converges_to_batch(spark, tmp_path):
    """Streaming KMV sketch: after all micro-batches the estimate equals
    the one-shot batch KMV over the concatenated stream (merge law),
    and sub-k streams are counted exactly."""
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.streaming.windows import (
        kmv_cardinality_stream,
    )

    schema = T.StructType([T.StructField("key", T.StringType())])
    src = tmp_path / "keys"
    wave1 = [(f"k{i}",) for i in range(120)]
    wave2 = [(f"k{i}",) for i in range(60, 200)]   # overlaps wave 1
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = kmv_cardinality_stream(
        stream, str(tmp_path / "sketch"), str(tmp_path / "est"),
        str(tmp_path / "ckpt"), key_col="key", k=64,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ests = {r["epoch_id"]: r for r in
            spark.read.parquet(str(tmp_path / "est")).collect()}
    assert len(ests) == 2
    final = ests[max(ests)]
    # 200 distinct keys, k=64: sketch full, estimate within KMV error
    assert final["sketch_size"] == 64
    assert abs(final["est_distinct"] - 200) / 200 < 0.5
    # the merge law: the final sketch == batch KMV over all keys
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql
    both = spark.createDataFrame(wave1 + wave2, schema)
    want = sorted(
        r["h"] for r in both.selectExpr(
            hash64_sql("CAST(key AS STRING)", "spark") + " AS h"
        ).distinct().orderBy("h").limit(64).collect()
    )
    got = sorted(
        r["h"] for r in spark.read.parquet(
            str(tmp_path / "sketch")).collect()
    )
    assert got == want


def test_kmv_cardinality_stream_exact_when_sub_k(spark, tmp_path):
    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.streaming.windows import (
        kmv_cardinality_stream,
    )

    schema = T.StructType([T.StructField("key", T.StringType())])
    src = tmp_path / "keys2"
    spark.createDataFrame(
        [(f"v{i}",) for i in range(30)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = kmv_cardinality_stream(
        stream, str(tmp_path / "sk2"), str(tmp_path / "est2"),
        str(tmp_path / "ck2"), key_col="key", k=256,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    r = spark.read.parquet(str(tmp_path / "est2")).collect()[0]
    assert r["sketch_size"] == 30 and r["est_distinct"] == 30.0
