"""Structured Streaming tests: availableNow file ingest + upsert parity with
the reference's S3-event semantics, windowed counts, stateful sessions."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.merge import check_unique
from european_emissions_data_warehouse_spark.sources.readers import load_table
from european_emissions_data_warehouse_spark.streaming.ingest import (
    dedup_stream,
    purchase_view_stream_join,
    run_incremental_upsert,
    run_windowed_counts,
    stream_from_directory,
)
from european_emissions_data_warehouse_spark.streaming.sessions import (
    run_sessionize_drain,
    sessionize_stateful,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def events_batch(spark, sf_dir):
    # materialized with µs timestamps (the nanos parquet needs load_table)
    return load_table(spark, sf_dir, "events")


def test_file_drop_ingest_with_upsert(spark, events_batch, tmp_path):
    """Drop file 1, drain; drop file 2 with overlapping keys, drain —
    the warehouse must show last-write-wins on event_id, like the
    reference's re-ingest path (lambda_handler_warehouse.py:95-101)."""
    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    first = events_batch.filter(F.col("event_id") < 100)
    first.coalesce(1).write.mode("overwrite").parquet(landing)

    def drain():
        stream = stream_from_directory(
            spark, landing, spark.read.parquet(landing).schema
        )
        run_incremental_upsert(
            stream, warehouse, ckpt, key=["event_id"], order_by=["ts", "value"]
        )

    drain()
    wh1 = spark.read.parquet(warehouse)
    assert wh1.count() == first.count()

    # second drop: 50 updated events (value bumped) + 20 new ones
    updates = (
        events_batch.filter(F.col("event_id") < 50)
        .withColumn("value", F.lit(12345.0))
    )
    news = events_batch.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 120)
    )
    updates.unionByName(news).coalesce(1).write.mode("append").parquet(landing)
    drain()

    wh2 = spark.read.parquet(warehouse)
    assert wh2.count() == first.count() + 20
    assert check_unique(wh2, ["event_id"]) == 0
    assert (
        wh2.filter((F.col("event_id") < 50) & (F.col("value") != 12345.0)).count() == 0
    )
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_interrupted_swap_recovers_stranded_table(spark, events_batch, tmp_path):
    """A crash between swap_dirs' two renames leaves the table under
    ``warehouse__trash_N`` with the final path missing.  The next drain
    must restore it before merging — NOT silently reinitialize the
    warehouse with only the replayed batch's rows (code-review r4)."""
    import os

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    first = events_batch.filter(F.col("event_id") < 100)
    first.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    def drain():
        run_incremental_upsert(
            stream_from_directory(spark, landing, schema),
            warehouse,
            ckpt,
            key=["event_id"],
            order_by=["ts", "value"],
        )

    drain()
    n_first = spark.read.parquet(warehouse).count()
    assert n_first == first.count()

    # Simulate the crash window: final renamed to trash, staging never
    # promoted (an older leftover trash must lose to the newest).
    os.rename(warehouse, warehouse + "__trash_3")
    os.makedirs(warehouse + "__trash_1")

    news = events_batch.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 120)
    )
    news.coalesce(1).write.mode("append").parquet(landing)
    drain()

    wh = spark.read.parquet(warehouse)
    assert wh.count() == n_first + 20  # old rows survived the crash
    assert check_unique(wh, ["event_id"]) == 0
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_bootstrap_goes_through_staging_swap(spark, events_batch, tmp_path):
    """A crash mid-bootstrap-write must leave warehouse_path ABSENT, not a
    partial directory: the old direct write wedged every replay (exists
    probe -> merge branch -> unreadable read) with no self-heal.  Bootstrap
    now stages and promotes by atomic rename, so a replay over the crashed
    attempt's staging garbage must still bootstrap cleanly (code-review
    r4, second pass)."""
    import os

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    first = events_batch.filter(F.col("event_id") < 100)
    first.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    # leftover staging dir from a crashed first-bootstrap attempt
    os.makedirs(warehouse + "__staging_0")
    with open(warehouse + "__staging_0/garbage", "w") as fh:
        fh.write("partial")

    run_incremental_upsert(
        stream_from_directory(spark, landing, schema),
        warehouse,
        ckpt,
        key=["event_id"],
        order_by=["ts", "value"],
    )
    wh = spark.read.parquet(warehouse)
    assert wh.count() == first.count()
    assert not os.path.exists(warehouse + "__staging_0"), "staging must be promoted"
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_checkpoint_no_reprocess(spark, events_batch, tmp_path):
    """Draining twice without new files must not change the warehouse
    (file-source checkpoint = the exactly-once input ledger)."""
    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    events_batch.limit(50).coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    for _ in range(2):
        run_incremental_upsert(
            stream_from_directory(spark, landing, schema),
            warehouse,
            ckpt,
            key=["event_id"],
            order_by=["ts"],
        )
    assert spark.read.parquet(warehouse).count() == 50
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_batch, tmp_path):
    """Streaming tumbling-window agg == batch groupBy for every *finalized*
    window.  In append mode a window emits only once the watermark passes
    its end, so the trailing partial hour (window_end > max event time)
    stays in state — excluded from the truth set accordingly."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events_batch.coalesce(2).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    run_windowed_counts(
        stream_from_directory(spark, landing, schema), out, ckpt, watermark="0 seconds"
    )
    streamed = (
        spark.read.parquet(out)
        .groupBy("window_start", "event_type")
        .agg(F.sum("n_events").alias("n"))
    )
    max_ts = events_batch.agg(F.max("ts")).first()[0]
    batch = (
        events_batch.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts))
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, events_batch, tmp_path):
    """Stream-stream purchase↔view attribution join == the equivalent batch
    join (all data in one drain, so no watermark-dropped rows)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events_batch.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = stream_from_directory(spark, landing, schema)
    purchases = stream.filter(F.col("event_type") == "purchase")
    views = stream.filter(F.col("event_type") == "view")
    joined = purchase_view_stream_join(purchases, views)
    (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    streamed = spark.read.parquet(out)

    p = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"), F.col("value").alias("purchase_value"),
    )
    v = events_batch.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "view_id", F.col("p_user").alias("user_id"), "purchase_value")

    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_streaming_dedup_drops_in_horizon_duplicates(spark, events_batch, tmp_path):
    """dropDuplicatesWithinWatermark: a landing dir containing each event
    twice must yield each event_id exactly once after one drain."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = events_batch.limit(200)
    base.unionByName(base).coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    deduped = dedup_stream(
        stream_from_directory(spark, landing, schema), ["event_id"]
    )
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert check_unique(got, ["event_id"]) == 0


def test_rate_limited_ingest_batches(spark, events_batch, tmp_path):
    """maxFilesPerTrigger=1 over 3 landed files: three micro-batches drain
    sequentially, and the merged warehouse equals the all-at-once result."""
    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        events_batch.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = stream_from_directory(
        spark, landing, schema, max_files_per_trigger=1
    )
    run_incremental_upsert(stream, warehouse, ckpt, key=["event_id"], order_by=["ts"])
    wh = spark.read.parquet(warehouse)
    assert wh.count() == events_batch.count()
    assert check_unique(wh, ["event_id"]) == 0


def test_stream_static_enrichment(spark, events_batch, tmp_path):
    """Stream-static join: each micro-batch enriches against a broadcast
    dimension (no watermark or state needed — the static side is re-read
    per batch, so dim updates are picked up between triggers)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events_batch.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    tiers = spark.range(200).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias("tier"),
    )
    stream = stream_from_directory(spark, landing, schema)
    enriched = stream.join(F.broadcast(tiers), "user_id", "left").select(
        "event_id", "user_id", "tier", "value"
    )
    (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out)
    assert got.count() == events_batch.count()
    assert got.filter(F.col("tier").isNull()).count() == 0  # all users < 200


def test_state_v2_processor_semantics_match_batch(spark, events_batch):
    """Protobuf-free batch-parity check for the state-v2 operator (closes
    VERDICT r2 item #4): drive RunningTotalsProcessor through the exact
    handle contract transformWithStateInPandas uses — init -> named value
    state -> handleInputRows per key per micro-batch — with an in-memory
    handle, split the input into 3 micro-batches, and assert the final
    emission per key equals the batch groupBy.  The protobuf worker channel
    is the only part left to the env-gated integration test below."""
    import pandas as pd

    from european_emissions_data_warehouse_spark.streaming.state import (
        make_running_totals_processor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    pdf = events_batch.select("event_id", "user_id", "value").toPandas()
    emitted = {}
    # one processor instance per key-shard, as the real operator would have;
    # a single shared instance with per-key handles is the simplest harness
    procs = {}
    for batch_no in range(3):
        batch = pdf[pdf["event_id"] % 3 == batch_no]
        for uid, group in batch.groupby("user_id"):
            if uid not in procs:
                p = make_running_totals_processor()()
                p.init(FakeHandle())
                procs[uid] = p
            out = pd.concat(list(procs[uid].handleInputRows((uid,), iter([group]), None)))
            emitted[uid] = (
                int(out["n_events"].iloc[-1]),
                round(float(out["total_value"].iloc[-1]), 6),
            )
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert emitted == want


def test_transform_with_state_totals_match_batch(spark, events_batch, tmp_path):
    """transformWithStateInPandas (state-v2 API): per-user running totals
    maintained across 3 rate-limited micro-batches must equal the batch
    groupBy — the streaming-materialized-view contract.  Skips where the
    protobuf channel dependency is absent (state.py state_v2_available)."""
    from european_emissions_data_warehouse_spark.streaming.state import (
        running_totals,
        run_totals_drain,
        state_v2_available,
    )

    if not state_v2_available():
        pytest.skip(
            "transformWithState worker channel needs protobuf (absent here); "
            "operator semantics are still verified protobuf-free by "
            "test_state_v2_processor_semantics_match_batch"
        )

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        events_batch.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = stream_from_directory(spark, landing, schema, max_files_per_trigger=1)
    totals = running_totals(stream)
    run_totals_drain(totals, warehouse, ckpt)

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.read.parquet(warehouse).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want
    assert check_unique(spark.read.parquet(warehouse), ["user_id"]) == 0


def test_stateful_sessions_match_batch(spark, events_batch, tmp_path):
    """applyInPandasWithState sessions == the batch lag+cumsum sessionization.
    All data arrives in one micro-batch; in-batch gaps close sessions by
    data, and each user's final (open) session closes via the processing-time
    timeout — so the streamed output covers ALL batch sessions.  The query is
    stopped by the drain helper: availableNow alone never terminates a
    stateful query with pending-timeout work."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    small = events_batch.filter(F.col("user_id") < 20)
    small.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = stream_from_directory(spark, landing, schema)
    sessions = sessionize_stateful(stream, timeout_ms=3_000)
    run_sessionize_drain(sessions, out, ckpt, max_wait_s=120)
    streamed = spark.read.parquet(out)

    # batch truth: every session (the timeout flushes open ones too)
    from european_emissions_data_warehouse_spark.plans.analytics import q_sessionize

    truth = q_sessionize(spark, str("/root/testdata/sf0.001")).filter(
        F.col("user_id") < 20
    )
    assert streamed.count() == truth.count()
    s = sorted((r.user_id, r.n_events) for r in streamed.collect())
    t = sorted((r.user_id, r.n_events) for r in truth.collect())
    assert s == t
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_stateful_sessions_fold_out_of_order_across_batches(spark, tmp_path):
    """A late event landing in a LATER micro-batch must widen the open
    session, never regress it: `last = t` moved session_end backward and a
    following in-gap event then measured its gap from the stale lower
    bound and split the session the batch twin keeps whole (code-review
    r4).  Three events for one user — 12:00, then (next batch) 11:50 and
    12:25 — are ONE session: every pairwise gap from the true last event
    is under 30 minutes."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [(1, 1, "2024-06-01 12:00:00", 1.0)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [
            (1, 2, "2024-06-01 11:50:00", 1.0),   # late, within gap
            (1, 3, "2024-06-01 12:25:00", 1.0),   # 25 min after TRUE last
        ],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import os

    os.makedirs(landing)
    b1.coalesce(1).write.mode("append").parquet(landing)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    sessions = sessionize_stateful(stream, timeout_ms=3_000)
    run_sessionize_drain(sessions, out, ckpt, max_wait_s=120)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1, [tuple(r) for r in got]
    (r,) = got
    assert r["n_events"] == 3
    assert str(r["session_start"]).startswith("2024-06-01 11:50")
    assert str(r["session_end"]).startswith("2024-06-01 12:25")
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_corpus_prep_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming corpus prep == batch q_corpus_prep at the content level.
    The batch op keeps the smallest doc_id per duplicate text while the
    stream keeps the first arrival, so surviving ids may differ — but the
    kept (bpe_tokens, quality) multiset and the kept-count must match."""
    from european_emissions_data_warehouse_spark.plans.llm import q_corpus_prep
    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_corpus_prep_stream,
    )

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "ingest_ts", F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    )
    docs.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    run_corpus_prep_stream(stream_from_directory(spark, landing, schema), out, ckpt)
    streamed = spark.read.parquet(out)
    truth = q_corpus_prep(spark, sf_dir)

    assert streamed.count() == truth.count()
    s = sorted((r.bpe_tokens, r.quality) for r in streamed.collect())
    t = sorted((r.bpe_tokens, r.quality) for r in truth.collect())
    assert s == t
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_snapshot_ingest_versions_per_batch(spark, events_batch, tmp_path):
    """Streaming ingest into the versioned table: one commit per micro-batch,
    time travel across batches, LWW merge semantics at the head."""
    from european_emissions_data_warehouse_spark.operators.snapshots import SnapshotTable
    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_snapshot_ingest,
    )

    landing = str(tmp_path / "landing")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    first = events_batch.filter(F.col("event_id") < 100)
    first.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    def drain():
        run_snapshot_ingest(
            stream_from_directory(spark, landing, schema), tbl, ckpt,
            key=["event_id"], order_by=["ts", "value"],
        )

    drain()
    t = SnapshotTable(spark, tbl)
    assert t.history() == [0]
    assert t.read().count() == first.count()

    updates = events_batch.filter(F.col("event_id") < 50).withColumn(
        "value", F.lit(777.0)
    )
    news = events_batch.filter((F.col("event_id") >= 100) & (F.col("event_id") < 120))
    updates.unionByName(news).coalesce(1).write.mode("append").parquet(landing)
    drain()

    t = SnapshotTable(spark, tbl)
    assert t.history() == [0, 1]
    head = t.read()
    assert head.count() == first.count() + 20
    assert head.filter((F.col("event_id") < 50) & (F.col("value") != 777.0)).count() == 0
    assert check_unique(head, ["event_id"]) == 0
    # time travel: version 0 predates the update batch
    v0 = t.read(0)
    assert v0.count() == first.count()
    assert v0.filter(F.col("value") == 777.0).count() == 0

    # crash-replay idempotence (ADVICE r2): restarting from the SAME
    # checkpoint replays nothing, leaving the VERSION HISTORY (not just the
    # head contents) unchanged — commit_meta records which batch produced
    # each version, stamped with its checkpoint generation
    assert t.commit_meta(0)["batch_id"] == "0"
    assert t.commit_meta(1)["batch_id"] == "1"
    assert "ckpt_gen" in t.commit_meta(0)
    drain()
    t = SnapshotTable(spark, tbl)
    assert t.history() == [0, 1]
    # checkpoint LOSS = a new generation: its batches must NOT be skipped
    # against the old ledger (a different chop would silently drop data —
    # code-review r4).  LWW upsert is content-idempotent, so the re-ingest
    # adds versions while the head content stays identical.
    shutil.rmtree(ckpt, ignore_errors=True)
    drain()
    t = SnapshotTable(spark, tbl)
    assert len(t.history()) > 2, "fresh generation must re-ingest"
    assert t.read().count() == first.count() + 20
    assert check_unique(t.read(), ["event_id"]) == 0
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_sketch_stream_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Sketch linearity across micro-batches: streaming the token stream in
    TWO separate landing drops (maxFilesPerTrigger=1 → one merge per file)
    yields counter-for-counter the same table as one batch build."""
    from european_emissions_data_warehouse_spark.operators.sketches import (
        count_min_build,
    )
    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_sketch_stream,
        stream_from_directory,
    )

    landing = str(tmp_path / "landing")
    sketch_path = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    tokens = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    half_a = tokens.filter(F.crc32(F.col("token")) % 2 == 0)
    half_b = tokens.filter(F.crc32(F.col("token")) % 2 == 1)
    half_a.coalesce(1).write.mode("overwrite").parquet(landing)
    half_b.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema

    run_sketch_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        sketch_path,
        ckpt,
        depth=3,
        width=256,
    )
    from european_emissions_data_warehouse_spark.operators.snapshots import (
        SnapshotTable,
    )

    table = SnapshotTable(spark, sketch_path)
    streamed = {
        (r["row_j"], r["bucket"]): r["cnt"] for r in table.read().collect()
    }
    batch = {
        (r["row_j"], r["bucket"]): r["cnt"]
        for r in count_min_build(tokens, depth=3, width=256).collect()
    }
    assert streamed == batch
    # crash-replay idempotence (ADVICE r3): restarting from the SAME
    # checkpoint replays nothing new and commits nothing — the sketch is a
    # sum, so a single double-merge would inflate every cell
    versions_before = table.history()
    assert table.applied_batch_ids() == {0, 1}
    run_sketch_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        sketch_path,
        ckpt,
        depth=3,
        width=256,
    )
    assert table.history() == versions_before, "same checkpoint: no new commits"
    # checkpoint LOSS is a different story (code-review r4): a fresh
    # checkpoint restarts batch numbering over a possibly different file
    # chop, so its batches must NOT be skipped against the old ledger —
    # and since CMS counters are sums, re-merging would double-count.
    # The stream must refuse loudly instead of doing either silently.
    shutil.rmtree(ckpt, ignore_errors=True)
    with pytest.raises(Exception, match="checkpoint generation"):
        run_sketch_stream(
            stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
            sketch_path,
            ckpt,
            depth=3,
            width=256,
        )
    replayed = {
        (r["row_j"], r["bucket"]): r["cnt"] for r in table.read().collect()
    }
    assert replayed == batch, "refused generation must leave the sketch intact"
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_neardup_dedup_stream_suppresses_across_batches(spark, sf_dir, tmp_path):
    """Near-dup suppression survives ACROSS micro-batches (unlike the
    watermark-bounded exact dedup): re-streaming the SAME docs in a later
    drop adds nothing to the corpus, and the surviving set matches what
    batch LSH dedup would keep."""
    from european_emissions_data_warehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_neardup_dedup_stream,
        stream_from_directory,
    )

    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ck = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents").limit(60).localCheckpoint()
    docs.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    run_neardup_dedup_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        store, out, ck,
    )
    kept1 = spark.read.parquet(out)
    # batch truth: docs minus later-id members of LSH pairs
    pairs = minhash_lsh_pairs(docs).collect()
    dup_ids = {r["id_b"] for r in pairs}
    assert {r["doc_id"] for r in kept1.collect()} == (
        {r["doc_id"] for r in docs.collect()} - dup_ids
    )

    # second drop: identical content, shifted ids -> all near-dups of kept1
    docs.withColumn("doc_id", F.col("doc_id") + 1000).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run_neardup_dedup_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        store, out, ck,
    )
    kept2 = spark.read.parquet(out)
    assert kept2.count() == kept1.count(), "re-streamed content must all be suppressed"

    # within-checkpoint crash replay stays idempotent (same generation:
    # self-id exclusion + per-batch partition OVERWRITE); checkpoint LOSS
    # is a NEW generation whose batch numbering restarts at 0 over a
    # possibly different chop — partitions from the old generation would
    # be overwritten with different doc sets and stale ones would linger
    # as duplicates, so the stream refuses via the store's _generation
    # marker instead of converging-by-luck (code-review r4).
    kept_ids_before = {r["doc_id"] for r in kept2.collect()}
    store_rows_before = spark.read.parquet(store).count()
    shutil.rmtree(ck, ignore_errors=True)
    with pytest.raises(Exception, match="checkpoint generation"):
        run_neardup_dedup_stream(
            stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
            store, out, ck,
        )
    spark.catalog.refreshByPath(out)
    spark.catalog.refreshByPath(store)
    kept3_rows = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in kept3_rows} == kept_ids_before
    assert len(kept3_rows) == len(kept_ids_before)
    assert spark.read.parquet(store).count() == store_rows_before
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_hll_stream_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming HLL union across micro-batches must estimate exactly what
    one batch sketch over the whole stream estimates (register-wise max is
    chop-invariant), and replayed batches must not add versions."""
    from european_emissions_data_warehouse_spark.operators.snapshots import (
        SnapshotTable,
    )
    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_hll_stream,
        stream_from_directory,
    )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "hll")
    ck = str(tmp_path / "ck")
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    half_a = ev.filter(F.crc32(F.col("user_id").cast("string")) % 2 == 0)
    half_b = ev.filter(F.crc32(F.col("user_id").cast("string")) % 2 == 1)
    half_a.coalesce(1).write.mode("overwrite").parquet(landing)
    half_b.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema

    run_hll_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        table, ck, key_cols=["event_type"], value_col="user_id",
    )
    t = SnapshotTable(spark, table)
    streamed = {
        r["event_type"]: r["est"]
        for r in t.read()
        .select("event_type", F.hll_sketch_estimate("hll").alias("est"))
        .collect()
    }
    batch = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est"))
        .collect()
    }
    assert streamed == batch
    versions = t.history()
    # same checkpoint: nothing replays, nothing commits
    run_hll_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        table, ck, key_cols=["event_type"], value_col="user_id",
    )
    assert t.history() == versions, "same checkpoint: no new commits"
    # checkpoint loss = a NEW generation: its batch ids must not be
    # suppressed by the old ledger (that silently drops any file the new
    # chop groups differently — code-review r4).  HLL union is idempotent
    # register-wise max, so the re-merge is content-safe: version history
    # grows, estimates stay exactly the batch truth.
    shutil.rmtree(ck, ignore_errors=True)
    run_hll_stream(
        stream_from_directory(spark, landing, schema, max_files_per_trigger=1),
        table, ck, key_cols=["event_type"], value_col="user_id",
    )
    assert len(t.history()) > len(versions), "fresh generation must re-merge"
    re_streamed = {
        r["event_type"]: r["est"]
        for r in t.read()
        .select("event_type", F.hll_sketch_estimate("hll").alias("est"))
        .collect()
    }
    assert re_streamed == batch


def test_stateful_sessions_split_far_early_out_of_order_event(spark, tmp_path):
    """An out-of-order event arriving MORE than a gap before the open
    session must become its own earlier session, not widen the open one
    via min(start, t): state [12:00,12:10] + a late 07:00 event is TWO
    sessions (a 5-hour silence sits between), exactly what the batch twin
    emits (code-review r4, streaming pass)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [(1, 1, "2024-06-01 12:00:00", 1.0), (1, 2, "2024-06-01 12:10:00", 1.0)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [(1, 3, "2024-06-01 07:00:00", 5.0)],  # >gap BEFORE the open session
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import os

    os.makedirs(landing)
    b1.coalesce(1).write.mode("append").parquet(landing)
    b2.coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    sessions = sessionize_stateful(stream, timeout_ms=3_000)
    run_sessionize_drain(sessions, out, ckpt, max_wait_s=120)
    got = sorted(spark.read.parquet(out).collect(), key=lambda r: r["session_start"])
    assert len(got) == 2, [tuple(r) for r in got]
    early, late = got
    assert early["n_events"] == 1 and str(early["session_start"]).startswith("2024-06-01 07:00")
    assert late["n_events"] == 2 and str(late["session_end"]).startswith("2024-06-01 12:10")
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_ledgered_stream_rejects_table_deleted_under_live_checkpoint(
    spark, events_batch, tmp_path
):
    """Deleting/resetting the state table while keeping the checkpoint must
    fail loudly: the file source will never re-read the already-committed
    batches, so continuing would silently rebuild from only the remaining
    input (code-review r4, streaming pass)."""
    import pytest

    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_snapshot_ingest,
        stream_from_directory,
    )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    events_batch.limit(5).coalesce(1).write.mode("append").parquet(landing)
    stream = stream_from_directory(spark, landing, events_batch.schema)
    run_snapshot_ingest(stream, table, ckpt, key=["event_id"], order_by=["ts"])

    shutil.rmtree(table)  # "reset" the table, keep the checkpoint
    events_batch.limit(10).coalesce(1).write.mode("append").parquet(landing)
    stream2 = stream_from_directory(spark, landing, events_batch.schema)
    with pytest.raises(Exception, match="no commit history"):
        run_snapshot_ingest(stream2, table, ckpt, key=["event_id"], order_by=["ts"])
    shutil.rmtree(str(tmp_path), ignore_errors=True)
