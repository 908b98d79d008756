"""Structured Streaming forms produce the same results as their batch twins.

Each test writes a small static fixture to parquet, replays it through
``readStream`` with ``trigger(availableNow=True)`` into a memory sink, and
compares against the batch-form DataFrame on identical input — proving the
streaming wiring (source, watermark, output mode) around the shared logical
plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pr2_transformation_spark.streaming.windows import (
    streaming_dedup,
    streaming_tumbling_agg,
    tumbling_agg,
)


def _finish(q, timeout=180):
    """Wait for the query to finish its DATA, then stop it.  availableNow
    queries that schedule processing-time state timers never
    self-terminate (the timer loop keeps emitting no-data batches — and
    keeps processAllAvailable spinning too), so: wait until the query
    either terminates on its own or has committed two consecutive
    zero-input batches (all data drained, only timer ticks left), then
    stop.  Deterministic for both terminating and timer-looping shapes."""
    import time

    deadline = time.time() + timeout
    idle, last_batch = 0, -1
    while time.time() < deadline and q.isActive:
        p = q.lastProgress
        if p is not None and p["batchId"] != last_batch:
            last_batch = p["batchId"]
            idle = idle + 1 if p["numInputRows"] == 0 else 0
            if idle >= 2:
                break
        time.sleep(0.5)
    else:
        assert not q.isActive, "stream never drained its input"
    if q.isActive:
        q.stop()
    q.awaitTermination(60)


def _events_fixture(spark):
    rows = [
        (1, "2024-01-01 00:01:00", 10, "view", 1.0),
        (2, "2024-01-01 00:04:30", 10, "view", 2.0),
        (3, "2024-01-01 00:11:00", 10, "click", 3.0),
        (4, "2024-01-01 00:12:00", 11, "view", 4.0),
        (5, "2024-01-01 00:59:59", 11, "click", 5.0),
        (6, "2024-01-01 01:00:00", 11, "click", 6.0),
    ]
    return (
        spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )


def _run_stream(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)
    return spark.table(name)


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    ev = _events_fixture(spark)
    path = str(tmp_path / "ev")
    ev.write.parquet(path)

    stream = spark.readStream.schema(ev.schema).parquet(path)
    got = _run_stream(
        spark,
        streaming_tumbling_agg(stream, "ts", "10 minutes", "10 minutes", ["event_type"]),
        "t_tumbling",
    )
    expected = tumbling_agg(ev, "ts", "10 minutes", ["event_type"])
    assert _rows(got) == _rows(expected)
    # sanity: window boundaries actually split the fixture
    assert got.count() >= 4


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = _events_fixture(spark)
    dup = ev.union(ev.limit(2))  # two duplicate event_ids
    path = str(tmp_path / "dup")
    dup.write.parquet(path)

    stream = spark.readStream.schema(dup.schema).parquet(path)
    out = streaming_dedup(stream, ["event_id"], "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)
    got = spark.table("t_dedup")
    assert got.count() == 6
    assert got.select("event_id").distinct().count() == 6


def test_streaming_stateful_user_stats(spark, tmp_path):
    """applyInPandasWithState: running per-user totals across micro-batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401 - import check

    from pr2_transformation_spark.streaming.windows import streaming_user_stats

    ev = _events_fixture(spark)
    path = str(tmp_path / "state")
    ev.write.parquet(path)

    stream = spark.readStream.schema(ev.schema).parquet(path)
    out = streaming_user_stats(stream, "user_id", "ts", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)
    got = {r["user_id"]: r for r in spark.table("t_state").collect()}
    assert got[10]["n_events"] == 3 and abs(got[10]["sum_value"] - 6.0) < 1e-9
    assert got[11]["n_events"] == 3 and abs(got[11]["sum_value"] - 15.0) < 1e-9


def test_streaming_session_agg_runs(spark, tmp_path):
    """Session windows under streaming: state machinery runs end-to-end and
    merges the two <30min-gap user-10 events into one session."""
    from pr2_transformation_spark.streaming.windows import streaming_session_agg

    ev = _events_fixture(spark)
    path = str(tmp_path / "sess")
    ev.write.parquet(path)

    stream = spark.readStream.schema(ev.schema).parquet(path)
    try:
        got = _run_stream(
            spark,
            streaming_session_agg(stream, "ts", "30 minutes", "30 minutes", ["user_id"]),
            "t_session",
        )
    except Exception as e:  # pragma: no cover - version-dependent support
        pytest.skip(f"streaming session windows unsupported here: {e}")
    # user 10: all events within 30min gaps -> 1 session of 3
    u10 = [r for r in got.collect() if r["user_id"] == 10]
    assert len(u10) == 1 and u10[0]["n_events"] == 3


def test_streaming_checkpoint_recovery_dedup_state(spark, tmp_path):
    """Dedup state survives a query restart via checkpoint: events already
    seen before the restart are still suppressed after it."""
    ev = _events_fixture(spark)
    data_dir = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        # memory sink does not support recovery; the file sink does
        stream = spark.readStream.schema(ev.schema).parquet(data_dir)
        q = (
            streaming_dedup(stream, ["event_id"], "ts", "2 hours")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _finish(q)

    # phase A: first three events
    ev.filter(F.col("event_id") <= 3).write.parquet(data_dir)
    run_once()
    assert spark.read.parquet(out_dir).count() == 3

    # phase B: new files re-deliver events 2,3 plus new events 4-6;
    # a fresh query resumes from the same checkpoint
    ev.filter(F.col("event_id").isin(2, 3, 4, 5, 6)).coalesce(1).write.mode(
        "append"
    ).parquet(data_dir)
    run_once()
    emitted = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    # recovered dedup state suppressed the 2,3 redeliveries
    assert emitted == [1, 2, 3, 4, 5, 6]


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream attribution join (clicks within 10m of an impression,
    same user) equals the batch interval join on identical input."""
    from pr2_transformation_spark.streaming.joins import (
        interval_join,
        streaming_interval_join,
    )

    imps = spark.createDataFrame(
        [
            (100, "2024-01-01 00:00:00", 10),
            (101, "2024-01-01 00:30:00", 10),
            (102, "2024-01-01 00:05:00", 11),
        ],
        "imp_id long, ts string, user_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    clicks = spark.createDataFrame(
        [
            (200, "2024-01-01 00:04:00", 10),  # matches imp 100 only
            (201, "2024-01-01 00:36:00", 10),  # matches imp 101 only
            (202, "2024-01-01 00:20:00", 11),  # outside 10m of imp 102
        ],
        "click_id long, ts string, user_id long",
    ).withColumn("ts", F.to_timestamp("ts"))

    p1, p2 = str(tmp_path / "imps"), str(tmp_path / "clicks")
    imps.write.parquet(p1)
    clicks.write.parquet(p2)
    s1 = spark.readStream.schema(imps.schema).parquet(p1)
    s2 = spark.readStream.schema(clicks.schema).parquet(p2)

    joined = streaming_interval_join(
        s1, s2, "user_id", "ts", "ts", "10 minutes", "10 minutes"
    ).select("imp_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)
    got = _rows(spark.table("t_ssjoin"))

    expected = _rows(
        interval_join(imps, clicks, "user_id", "ts", "ts", "10 minutes").select(
            "imp_id", "click_id"
        )
    )
    assert got == expected == [("100", "200"), ("101", "201")]


def test_streaming_enrich_is_stateless_broadcast(spark, tmp_path):
    from pr2_transformation_spark.streaming.joins import enrich

    ev = _events_fixture(spark)
    path = str(tmp_path / "ev_enrich")
    ev.write.parquet(path)
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(ev.schema).parquet(path)
    out = enrich(stream, dim, "user_id").select("event_id", "tier")
    q = (
        out.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)
    got = _rows(spark.table("t_enrich"))
    assert got == _rows(ev.join(dim, "user_id").select("event_id", "tier"))


def test_foreach_batch_sink_is_idempotent(spark, tmp_path):
    """Exactly-once contract of the batch-id-overwrite sink: streaming a
    fixture lands every row once; simulating a failure-replay of an
    already-written batch (partial AND full rewrite) changes nothing."""
    from pr2_transformation_spark.streaming.sinks import (
        idempotent_parquet_sink,
        read_sink,
        write_batch_idempotent,
    )

    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    dest = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(idempotent_parquet_sink(dest))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)

    got = read_sink(spark, dest)
    assert got.count() == ev.count()
    assert "batch_id" in got.columns
    batch_ids = [r["batch_id"] for r in got.select("batch_id").distinct().collect()]

    # Replay every batch (as the engine would after a sink failure): first a
    # partial write of a subset, then the full batch again. Rows come from
    # the (replayable) source, not the sink being overwritten.
    replay = {
        bid: got.filter(F.col("batch_id") == bid).drop("batch_id").collect()
        for bid in batch_ids
    }
    expected = _rows(got.drop("batch_id"))
    for bid, rows in replay.items():
        full = spark.createDataFrame(rows, ev.schema)
        write_batch_idempotent(full.limit(1), bid, dest)
        write_batch_idempotent(full, bid, dest)

    again = read_sink(spark, dest)
    assert _rows(again.drop("batch_id")) == expected


def test_upsert_snapshot_sink_keeps_latest_per_key(spark, tmp_path):
    """The foreachBatch upsert sink maintains one row per user with the
    greatest timestamp across micro-batches, and re-applying a batch
    (failure replay) leaves the snapshot unchanged."""
    from pr2_transformation_spark.streaming.sinks import (
        upsert_snapshot_batch,
        upsert_snapshot_sink,
    )

    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    dest = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    # Two source files so availableNow replays >1 micro-batch.
    ev.filter(F.col("event_id") <= 3).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") > 3).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            upsert_snapshot_sink(dest, ["user_id"], "ts")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)

    snap = spark.read.parquet(dest)
    expected = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s"))
        .select("user_id", "s.*")
        .select(*ev.columns)  # column order
    )
    assert snap.count() == 2  # one row per user
    assert _rows(snap.select(*ev.columns)) == _rows(expected)

    # Failure replay: re-merge the newest rows again — snapshot unchanged.
    before = _rows(spark.read.parquet(dest).select(*ev.columns))
    upsert_snapshot_batch(
        ev.filter(F.col("event_id") > 3), 1, dest, ["user_id"], "ts"
    )
    assert _rows(spark.read.parquet(dest).select(*ev.columns)) == before


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The transformWithStateInPandas form produces the same final
    per-user profile as the applyInPandasWithState form. Skipped where the
    protobuf Python package (the TWS state-server protocol) is absent."""
    # no skip: where google.protobuf is absent the operator activates
    # the from-scratch miniproto runtime (vendor/miniproto) and the TWS
    # path runs for real against the JVM state server
    from pr2_transformation_spark.streaming.windows import (
        streaming_user_stats,
        streaming_user_stats_tws,
    )

    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        results = {}
        for name, op in (
            ("aipws", streaming_user_stats),
            ("tws", streaming_user_stats_tws),
        ):
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = (
                op(stream)
                .writeStream.format("memory")
                .queryName(f"uxs_{name}")
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            _finish(q)
            results[name] = _rows(spark.table(f"uxs_{name}"))
        assert results["tws"] == results["aipws"]
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_user_stats_restart_recovery(spark, tmp_path):
    """Kill-and-resume for the custom stateful operator: run
    streaming_user_stats over phase-A events with a checkpoint, stop the
    query, deliver phase-B events, and restart a FRESH query from the same
    checkpoint.  The recovered state must continue the per-user running
    totals exactly once — phase-A events counted once (not re-read after
    restart), phase-B increments applied on top of recovered counts."""
    from pr2_transformation_spark.streaming.sinks import upsert_snapshot_sink
    from pr2_transformation_spark.streaming.windows import streaming_user_stats

    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    dest = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = streaming_user_stats(stream, "user_id", "ts", "value")
        q = (
            out.writeStream.foreachBatch(
                upsert_snapshot_sink(dest, ["user_id"], "last_seen_epoch")
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _finish(q)

    # phase A: events 1-3 (user 10: 3 events, sum 6.0)
    ev.filter(F.col("event_id") <= 3).coalesce(1).write.parquet(src)
    run_once()
    snap = {r["user_id"]: r for r in spark.read.parquet(dest).collect()}
    assert snap[10]["n_events"] == 3 and abs(snap[10]["sum_value"] - 6.0) < 1e-9
    assert 11 not in snap

    # phase B: events 4-6 for user 11, plus one more for user 10
    more = spark.createDataFrame(
        [(7, "2024-01-01 00:20:00", 10, "click", 10.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.filter(F.col("event_id") > 3).unionByName(more).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()  # fresh query object, same checkpoint -> state recovered

    snap = {r["user_id"]: r for r in spark.read.parquet(dest).collect()}
    # user 10: 3 recovered + 1 new = 4 events, 6.0 + 10.0 (NOT 12.0+10.0 or 1+10)
    assert snap[10]["n_events"] == 4, f"state not recovered: {snap[10]}"
    assert abs(snap[10]["sum_value"] - 16.0) < 1e-9
    # user 11 appears with exactly its phase-B totals
    assert snap[11]["n_events"] == 3 and abs(snap[11]["sum_value"] - 15.0) < 1e-9


def test_foreach_batch_merge_upsert_bucket_pruned(spark, tmp_path):
    """Streaming CDC apply through Catalog.merge_upsert: a multi-batch
    availableNow stream maintains the same latest-per-key snapshot as the
    whole-rewrite sink, but in the hash-bucketed O(affected-buckets)
    layout."""
    from pr2_transformation_spark.sources.catalog import Catalog

    cat = Catalog(spark, root=str(tmp_path / "lake"))
    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") <= 3).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") > 3).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: cat.merge_upsert(
                "p.d.user_snapshot", batch, ["user_id"], "ts", num_buckets=8
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _finish(q)

    snap = spark.read.parquet(cat.path_for("p.d.user_snapshot")).drop("__bucket")
    expected = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s"))
        .select("user_id", "s.*")
    )
    assert snap.count() == 2
    assert _rows(snap.select(*ev.columns)) == _rows(expected.select(*ev.columns))


def test_merge_sink_unchanged_under_forced_epoch_replay(spark, tmp_path):
    """The Structured Streaming recovery contract, exercised through the
    ENGINE rather than by hand: after the stream finishes, the last
    epoch's entry is deleted from the checkpoint's commit log and the
    stream is restarted — the engine then re-fires that exact epoch's
    batch (same batch_id, same offsets) into the foreachBatch MERGE
    sink.  An at-least-once replay of an already-applied epoch must
    leave the snapshot byte-identical (same winners, same rows)."""
    import os

    from pr2_transformation_spark.sources.catalog import Catalog

    cat = Catalog(spark, root=str(tmp_path / "lake"))
    ev = _events_fixture(spark)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") <= 3).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") > 3).coalesce(1).write.mode("append").parquet(src)

    def start(ckpt_dir):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda batch, _bid: cat.merge_upsert(
                    "p.d.replay_snapshot", batch, ["user_id"], "ts", num_buckets=8
                )
            )
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )

    _finish(start(ckpt))
    snap_path = cat.path_for("p.d.replay_snapshot")
    before = sorted(_rows(spark.read.parquet(snap_path).drop("__bucket")))

    # Force the replay: restart from a checkpoint copy whose newest commit
    # is missing, so the query believes that epoch never committed and
    # re-runs it from the still-present offset log.  (A copy, not an
    # in-place delete: the session caches each checkpoint path's metadata
    # log and treats an in-place mutation as a concurrent writer.)
    import shutil

    ckpt2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(ckpt, ckpt2)
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt2, "commits")) if f.isdigit()
    )
    assert len(commits) >= 2  # maxFilesPerTrigger=1 over 2 files
    os.remove(os.path.join(ckpt2, "commits", commits[-1]))
    crc = os.path.join(ckpt2, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # stale Hadoop checksum sidecar → spurious
        os.remove(crc)  # FileAlreadyExists on the replayed commit write

    _finish(start(ckpt2))
    after = sorted(_rows(spark.read.parquet(snap_path).drop("__bucket")))
    assert after == before


def test_streaming_repetition_and_decontamination_gates(spark, tmp_path):
    """Round-5 corpus-hygiene gates running PER MICRO-BATCH: each
    arriving batch of docs is (1) repetition-profiled and gated at the
    published MassiveText bounds, then (2) span-decontaminated against a
    STATIC benchmark gram set (the broadcast design — the stream side
    never shuffles against the benchmark), before landing in the sink."""
    import json

    from pyspark.sql import functions as F

    from pr2_transformation_spark.functions import dedup, textstats

    src = tmp_path / "in"
    src.mkdir()
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    clean_words = " ".join(f"w{i}" for i in range(40))
    secret = "alpha beta gamma delta epsilon zeta"
    docs = [
        {"doc_id": 1, "text": clean_words},                    # passes both
        {"doc_id": 2, "text": "spam spam spam spam spam spam"},  # repetition
        {
            "doc_id": 3,  # clean repetition-wise, but carries the secret
            "text": " ".join(f"v{i}" for i in range(20))
            + f" {secret} "
            + " ".join(f"u{i}" for i in range(14)),
        },
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(d) for d in docs))

    bench = spark.createDataFrame([(100, f"junk {secret} junk")], ["doc_id", "text"])

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))

    def gate(batch, _bid):
        prof = textstats.repetition_keep(textstats.repetition_profile(batch))
        clean = batch.join(prof.filter("keep").select("doc_id"), "doc_id")
        stats = dedup.contamination_stats(clean, bench, k=4)
        ok = stats.filter(F.col("contaminated_fraction") <= 0.1).select("doc_id")
        clean.join(ok, "doc_id").write.mode("append").parquet(sink)

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_streaming_hll_merge_equals_batch_build(spark, tmp_path):
    """q363's contract: per-micro-batch HLL partials folded by max must
    equal the one-shot batch register build (merge associativity), and
    the stream must actually split into multiple micro-batches."""
    from pr2_transformation_spark.functions import sketches as sk

    src = str(tmp_path / "src")
    ids = spark.range(0, 3000).select(
        (F.col("id") % 700).cast("string").alias("user_id"))
    ids.repartition(3).write.parquet(src)

    state: dict[int, int] = {}
    batch_ids: list[int] = []

    def fold(batch_df, bid):
        batch_ids.append(bid)
        for r in sk.hll_register_table(batch_df, "user_id", p=8).collect():
            b = int(r["bucket"])
            state[b] = max(state.get(b, 0), int(r["rho_max"]))

    q = (
        spark.readStream.schema("user_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(batch_ids) >= 2  # genuinely incremental
    batch_regs = {
        int(r["bucket"]): int(r["rho_max"])
        for r in sk.hll_register_table(
            spark.read.parquet(src), "user_id", p=8).collect()
    }
    assert state == batch_regs
