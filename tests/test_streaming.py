"""Structured Streaming tests: windowed aggregation equivalence to the
batch plan, append-mode watermark emission, and cross-micro-batch state
in the stateful sessionizer."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_streaming_windowed_matches_batch(spark):
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.windowed import streaming_windowed_counts

    from pyspark.sql import functions as F

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in streaming_windowed_counts(spark, SF_SMALL).collect()
    }
    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "s")
        .collect()
    )
    assert len(batch) == len(got) > 0
    for r in batch:
        assert got[(r.ws, r.event_type)] == (r.n, r.s)


def test_streaming_sessions_cross_batch_state(spark, tmp_path):
    """Feeding the same events in 1 batch vs 2 must give identical
    session counts — state stitches sessions across the batch split."""
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.stateful import sessionize_stateful
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, SF_SMALL, "events").filter("user_id < 20")
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    split_dir = str(tmp_path / "events_split")
    # two files, time-ordered so sessions genuinely span the boundary
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(split_dir)
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    raw = run_stream_to_batch(sessionize_stateful(stream), mode="update")
    assert raw.agg(F.max("n_batches")).collect()[0][0] >= 2, "expected multiple batches"
    w = Window.partitionBy("user_id").orderBy(F.col("n_batches").desc())
    final = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )

    gaps = ev.select(
        "user_id",
        (F.unix_timestamp("ts")
         - F.unix_timestamp(F.lag("ts").over(
             Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts"))
         ))).alias("gap"),
    )
    expected = gaps.groupBy("user_id").agg(
        F.sum(F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0))
        .alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in final.collect()}
    for r in expected.collect():
        assert got[r.user_id] == (r.n_sessions, r.n_events)


def test_append_mode_watermark_emits_closed_windows(spark, tmp_path):
    """Append mode + watermark: with two time-ordered batches, windows
    closed by the advancing watermark are emitted after batch 2 while
    the tail windows (still within the watermark) are withheld."""
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.windowed import (
        run_stream_to_batch,
        windowed_event_stats,
    )

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMALL, "events")
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    split_dir = str(tmp_path / "events_wm")
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(split_dir)
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    appended = run_stream_to_batch(
        windowed_event_stats(stream, window="5 minutes", watermark="10 minutes"),
        mode="append",
    )
    total = (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type").count().count()
    )
    n_emitted = appended.count()
    # some but not all windows emitted: watermark advanced past early
    # windows after batch 1, final windows stay open at end-of-stream
    assert 0 < n_emitted < total


def test_foreachbatch_upsert_sink_converges(spark, tmp_path):
    """Streaming windowed agg -> keyed upsert sink over two
    micro-batches: final warehouse state equals the batch computation
    (later batches overwrite earlier window rows by key)."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.sinks import upsert_sink
    from dagster_etl_spark.streaming.windowed import windowed_event_stats

    ev = load_table(spark, SF_SMALL, "events")
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    split_dir = str(tmp_path / "events_fb")
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(split_dir)
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    target = str(tmp_path / "wh" / "windowed")
    q = upsert_sink(
        windowed_event_stats(stream, window="5 minutes", watermark="10 minutes"),
        path=target,
        keys=["window_start", "event_type"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(target).collect()
    }
    expected = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "s")
        .collect()
    )
    assert len(expected) == len(got) > 0
    for r in expected:
        assert got[(r.ws, r.event_type)] == (r.n, r.s)


def test_event_time_timeout_sessionizer(spark, tmp_path):
    """Closed sessions stream out as the watermark passes their gap;
    emitted sessions must match the batch gap-sessionization for every
    session that ended well before the final watermark."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.stateful import sessionize_with_timeout
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    ev = load_table(spark, SF_SMALL, "events").filter("user_id < 30")
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    split_dir = str(tmp_path / "events_tmo")
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(split_dir)
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    got = run_stream_to_batch(
        sessionize_with_timeout(stream, watermark="30 minutes"), mode="append"
    )
    got_set = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    assert got_set, "expected some closed sessions emitted"

    # batch truth: all sessions via gap split
    sec = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("t")
    sessions = (
        ev.select("user_id", sec.alias("t"))
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .withColumn(
            "new_s", F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0)
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    truth = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions.collect()
    }
    # every emitted session must be a true session
    assert got_set <= truth
    # sessions closed long before the max watermark must have been emitted
    max_ts = ev.agg(F.max(F.unix_timestamp("ts").cast("long"))).collect()[0][0]
    wm_floor = max_ts - 3600 - 1800  # watermark delay + session gap, conservative
    must_emit = {s for s in truth if s[2] + 1800 < wm_floor}
    assert must_emit <= got_set


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Re-delivery in a LATER micro-batch must still be dropped: either
    the key is within the watermark horizon (still in state -> deduped)
    or it is older than the watermark (late -> dropped). Output never
    contains a second copy."""
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.dedup import dedup_stream
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    ev = load_table(spark, SF_SMALL, "events").filter("user_id < 20")
    d = str(tmp_path / "dup_events")
    ev.coalesce(1).write.parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)  # every record re-delivered

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_stream_to_batch(dedup_stream(stream), mode="append")
    n = ev.count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static join per micro-batch must equal the batch join."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.enrich import streaming_segment_stats

    got = {
        r.c_mktsegment: (r.n_events, r.sum_value)
        for r in streaming_segment_stats(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    cust = load_table(spark, SF_SMALL, "customer")
    batch = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    )
    assert len(batch) == len(got) > 0
    for r in batch:
        assert got[r.c_mktsegment] == (r.n, r.s)


def test_stream_stream_join_across_batches(spark, tmp_path):
    """Views in batch 1, purchases in batch 2: the buffered left side
    must still match — stream-stream join state survives the split."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.joins import attribution_join
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    ev = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type").isin("view", "purchase") & (F.col("user_id") < 30)
    )
    d = str(tmp_path / "split_vp")
    ev.filter("event_type = 'view'").coalesce(1).write.parquet(d)
    ev.filter("event_type = 'purchase'").coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    views = (
        stream.filter("event_type = 'view'")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        stream.filter("event_type = 'purchase'")
        .select("user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    got = run_stream_to_batch(
        attribution_join(views, purchases), mode="append"
    ).count()

    v = ev.filter("event_type = 'view'").select("user_id", F.col("ts").alias("vts"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    want = v.join(
        p,
        (v.user_id == p.pu)
        & (p.pts >= v.vts)
        & (p.pts <= v.vts + F.expr("interval 30 minutes")),
    ).count()
    assert got == want > 0


def test_error_bursts_cross_batch_updates(spark, tmp_path):
    """Splitting a burst window across two micro-batches must still
    produce the full count (update mode re-emits the window as late
    rows arrive); the last update per (window, user) equals the batch
    aggregate."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.windowed import (
        error_burst_alerts,
        run_stream_to_batch,
    )

    ev = load_table(spark, SF_SMALL, "events").filter("user_id IS NOT NULL")
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    split_dir = str(tmp_path / "ev_bursts")
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(split_dir)
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    raw = run_stream_to_batch(error_burst_alerts(stream), mode="update")
    # last emitted count per (window, user) across batches
    w = Window.partitionBy("window_start", "user_id").orderBy(F.col("n_errors").desc())
    final = raw.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")

    expected = (
        ev.filter("event_type = 'error'")
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("window_start"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter("n_errors >= 2")
    )
    got = {(r.window_start, r.user_id): r.n_errors for r in final.collect()}
    want = {(r.window_start, r.user_id): r.n_errors for r in expected.collect()}
    assert got == want and len(want) > 0


def test_streaming_media_decode_equals_batch(spark):
    """The real-codec decode operators run unchanged on a streaming
    frame: streaming rows == batch rows, typed identically."""
    from dagster_etl_spark.operators.multimodal import (
        decode_stats,
        synth_real_media_table,
    )
    from dagster_etl_spark.streaming.media import streaming_media_decode
    from tests.conftest import SF_SMALL

    from dagster_etl_spark.sources.fixtures import load_table

    stream_rows = sorted(
        tuple(r) for r in streaming_media_decode(spark, SF_SMALL).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in decode_stats(
            synth_real_media_table(load_table(spark, SF_SMALL, "documents"))
        ).collect()
    )
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_stateful_sessionizer_survives_null_timestamps(spark, tmp_path):
    """An event with a NULL timestamp reaches the state function as
    NaN and would crash int() mid-batch; it must be dropped (a null
    event time cannot be sessionized) without affecting other rows."""
    import datetime as dt

    from pyspark.sql import Row

    from dagster_etl_spark.streaming.stateful import sessionize_stateful
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        Row(user_id=1, ts=t0),
        Row(user_id=1, ts=None),
        Row(user_id=1, ts=t0 + dt.timedelta(hours=2)),  # new session
        Row(user_id=2, ts=None),  # user with ONLY null ts: no output row
    ]
    src = str(tmp_path / "null_ts_events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in run_stream_to_batch(sessionize_stateful(stream), mode="update").collect()
    }
    assert out == {1: (2, 2)}


def test_checkpoint_stop_restart_recovers_session_state(spark, tmp_path):
    """Stop a stateful sessionizer mid-corpus, restart from the SAME
    checkpoint with more input, and require the final per-user sessions
    to equal the batch oracle over ALL events. If state recovery were
    broken, sessions spanning the stop boundary would double-count and
    n_batches would reset to 1 on the restarted run."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.stateful import (
        SESSION_GAP_SEC,
        sessionize_stateful,
    )

    ev = load_table(spark, SF_SMALL, "events").filter(
        "user_id < 30 AND ts IS NOT NULL"
    )
    cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").collect()[0].c
    in_dir = str(tmp_path / "events_ckpt_in")
    updates = str(tmp_path / "updates")
    ckpt = str(tmp_path / "ckpt_restart")

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )

        def sink(batch_df, epoch_id):
            batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(updates)

        q = (
            sessionize_stateful(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half only, then the query STOPS (availableNow drains)
    ev.filter(F.col("ts") <= cutoff).coalesce(1).write.parquet(in_dir)
    run_once()
    # run 2: second half arrives; restart from the same checkpoint
    ev.filter(F.col("ts") > cutoff).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()

    upd = spark.read.parquet(updates)
    latest = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    got = {
        r.user_id: (r.n_sessions, r.n_events, r.n_batches)
        for r in upd.withColumn("rn", F.row_number().over(latest))
        .filter("rn = 1")
        .collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts_sec")
    oracle = (
        ev.selectExpr("user_id", "CAST(unix_timestamp(ts) AS BIGINT) AS ts_sec")
        .withColumn("prev", F.lag("ts_sec").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts_sec") - F.col("prev") > SESSION_GAP_SEC),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    assert len(oracle) == len(got) > 0
    for r in oracle:
        n_sessions, n_events, _ = got[r.user_id]
        assert (n_sessions, n_events) == (r.n_sessions, r.n_events), r.user_id
    # state genuinely crossed the restart: at least one user was folded
    # in BOTH runs (n_batches == 2 only if run 2 loaded run 1's state)
    assert any(nb == 2 for (_, _, nb) in got.values())


def test_watermark_evicts_expired_session_state(spark, tmp_path):
    """r11 verdict task 5: expired sessions must actually LEAVE state
    (state.remove() on event-time timeout), so long-horizon state is
    bounded by OPEN sessions, not users-ever-seen. Deterministic
    churn scenario in three ts-ordered micro-batches:
      batch 1: users 1..40, one event each at T0;
      batch 2: user 0 at T0+3h  (advances max event time);
      batch 3: user 0 at T0+4h  (batch watermark = T0+3h - 30min,
               far past every batch-1 session's gap -> all 40 time
               out, emit, and are REMOVED from state).
    Final state must hold only user 0's open session."""
    import time as _time

    from pyspark.sql import functions as F

    from dagster_etl_spark.streaming.stateful import sessionize_with_timeout

    t0 = "2024-01-01 00:00:00"
    batch1 = spark.range(1, 41).select(
        F.col("id").alias("user_id"), F.lit(t0).cast("timestamp").alias("ts")
    )
    batch2 = spark.createDataFrame(
        [(0, "2024-01-01 03:00:00")], "user_id BIGINT, ts STRING"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    batch3 = spark.createDataFrame(
        [(0, "2024-01-01 04:00:00")], "user_id BIGINT, ts STRING"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))

    in_dir = str(tmp_path / "churn_events")
    for b in (batch1, batch2, batch3):
        b.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.05)  # distinct mtimes -> batches process in ts order

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    name = "evict_sessions"
    q = (
        sessionize_with_timeout(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        ops = q.lastProgress["stateOperators"]
        rows_total = ops[0]["numRowsTotal"]
        removed = sum(
            (p.get("stateOperators") or [{}])[0].get("numRowsRemoved") or 0
            for p in q.recentProgress
        )
        emitted = {r.user_id for r in spark.table(name).collect()}
        # every batch-1 user's session closed, was emitted, and LEFT state
        assert emitted >= set(range(1, 41)), sorted(emitted)
        assert removed >= 40, f"only {removed} state rows evicted"
        assert rows_total <= 2, (
            f"state still holds {rows_total} rows; expired sessions "
            "were not evicted"
        )
    finally:
        spark.catalog.dropTempView(name)


def test_streaming_decontaminate_equals_batch(spark, tmp_path):
    """The ingest-time 13-gram probe must reach the batch verdict set
    doc-for-doc, including when the corpus arrives across multiple
    micro-batches (each batch probes the same static benchmark; the
    id-dedup state stitches re-sightings)."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.scrub import contaminated_ids
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.decontaminate import contaminated_stream
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 17 = 0")
    split_dir = str(tmp_path / "docs_stream")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(split_dir)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(split_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    got = {
        r.doc_id
        for r in run_stream_to_batch(
            contaminated_stream(stream, bench), mode="append"
        ).collect()
    }
    want = {r.doc_id for r in contaminated_ids(docs, bench).collect()}
    assert got == want
    assert want, "fixture produced no contaminated docs"


def test_streaming_decontaminate_watermark_variant(spark, tmp_path):
    """The long-horizon form (r12 ADVICE): with an event-time column
    the id-dedup switches to dropDuplicatesWithinWatermark, bounding
    state by the dedup horizon instead of keeping every contaminated
    id forever. Within a single pass (no doc re-arrives past the
    horizon) the verdict set must equal the batch verdicts exactly."""
    from dagster_etl_spark.operators.scrub import contaminated_ids
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.decontaminate import contaminated_stream
    from dagster_etl_spark.streaming.windowed import run_stream_to_batch

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 17 = 0")
    split_dir = str(tmp_path / "docs_stream_wm")
    docs.coalesce(1).write.parquet(split_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(split_dir)
        .selectExpr("*", "timestamp_seconds(1700000000 + doc_id % 600) AS ts")
    )
    got = {
        r.doc_id
        for r in run_stream_to_batch(
            contaminated_stream(
                stream, bench, event_time_col="ts", watermark="10 minutes"
            ),
            mode="append",
        ).collect()
    }
    want = {r.doc_id for r in contaminated_ids(docs, bench).collect()}
    assert got == want


def test_batch_drift_log_matches_replayed_model(spark):
    """The per-batch monitoring probes: each batch's drift against the
    LM as of the PREVIOUS batch must equal a replayed incremental
    drift computed by a second, independently-driven LM; values stay
    in [0, 1]; an off-distribution batch alerts high while an
    in-distribution one stays low."""
    from pyspark.sql import Row

    from dagster_etl_spark.operators.text import IncrementalUnigramLM
    from dagster_etl_spark.streaming.drift_monitor import batch_drift_log

    base = [Row(doc_id=i, lang="en", text="a b c d") for i in range(4)]
    same = [Row(doc_id=10 + i, lang="en", text="a b c d") for i in range(4)]
    shifted = [Row(doc_id=20 + i, lang="en", text="zz yy xx ww") for i in range(4)]
    batches = [
        spark.createDataFrame(base),
        spark.createDataFrame(same),
        spark.createDataFrame(shifted),
    ]
    log = batch_drift_log(spark, batches, "t_driftlog")
    assert [i for i, _ in log] == [1, 2]
    d1 = {r.slice: r for r in log[0][1]}
    d2 = {r.slice: r for r in log[1][1]}
    # batch 1 is distribution-identical to batch 0 -> drift 0
    assert d1["en"].tv_scaled == 0
    # batch 2 shares no vocabulary -> full mass moves: TV == 1
    assert d2["en"].tv == 1.0
    for d in (d1, d2):
        for r in d.values():
            assert 0 <= r.tv <= 1

    # independent replay with a second LM gives identical probes
    lm = IncrementalUnigramLM(spark, "t_driftlog_replay")
    lm.drop()
    lm.ingest(batches[0])
    r1 = {r.slice: r.tv_scaled for r in lm.drift(batches[1]).collect()}
    lm.ingest(batches[1])
    r2 = {r.slice: r.tv_scaled for r in lm.drift(batches[2]).collect()}
    lm.drop()
    assert r1 == {s: r.tv_scaled for s, r in d1.items()}
    assert r2 == {s: r.tv_scaled for s, r in d2.items()}


def test_streaming_quality_score_equals_batch_and_logs_keep_rates(spark):
    """The streaming classifier must equal the one-shot scorer
    bit-for-bit (frozen model, per-doc scores — no standing state to
    drift), and the per-batch observability rows must account for
    every scored document exactly."""
    from dagster_etl_spark.operators.text import quality_classifier_score
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.quality import streaming_quality_score
    from tests.conftest import SF_SMALL

    out = streaming_quality_score(spark, SF_SMALL)
    got = sorted(
        (r.doc_id, r.n_feats, r.logit_scaled, r.prob_decile, r.keep)
        for r in out.collect()
    )
    want = sorted(
        (r.doc_id, r.n_feats, r.logit_scaled, r.prob_decile, r.keep)
        for r in quality_classifier_score(
            load_table(spark, SF_SMALL, "documents")
        ).collect()
    )
    assert got == want
    # derive the scratch root from the returned frame's files —
    # calling scratch_dir() again would WIPE the directory (that is
    # its contract)
    import os

    batch_dir = os.path.dirname(out.inputFiles()[0].replace("file:", ""))
    work = os.path.dirname(os.path.dirname(batch_dir))  # scored/b<k> -> work
    assert os.path.basename(batch_dir).startswith("b")  # batch-keyed layout
    rates = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(work, "keep_rates"))
        .collect()
    )
    assert len(rates) >= 2  # really arrived as multiple micro-batches
    assert sum(r.n_docs for r in rates) == len(got)
    assert sum(r.n_keep for r in rates) == sum(1 for g in got if g[4])
