"""Multi-batch streaming evidence (r4 verdict #3).

Every streaming query in the gate runs AvailableNow over ONE static file =
one micro-batch, which never exercises cross-batch state. Here the same
events are split into a 3-file time-sequenced source directory and the
stream reads it with maxFilesPerTrigger=1, so AvailableNow runs >= 3
micro-batches: stream-stream join state survives batch boundaries, the
sessionizer's carried-open-session merge path actually runs, and the
watermark advances between batches. The reconciled union of per-batch
output must equal the single-batch (= batch-oracle-matched) answer.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _events_batch(spark):
    from wopen_spark.queries.registry import _t

    # mirror event_stream: expose ts as session-TZ TimestampType whether
    # the file stores TIMESTAMP(NANOS) or TIMESTAMP_NTZ
    return _t(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


@pytest.fixture(scope="module")
def sequenced_src(spark, tmp_path_factory):
    """events split into 3 time-ordered parquet files with ascending
    mtimes, so FileStreamSource picks them up oldest-first — an in-order
    arrival sequence (no late data beyond the watermark)."""
    base = tmp_path_factory.mktemp("seq_events")
    src = os.path.join(str(base), "src")
    os.makedirs(src)
    ev = _events_batch(spark).withColumn("ts_us", F.unix_micros("ts"))
    # put the first cut in the MIDDLE of a real click->purchase pair so the
    # stream-stream join provably has to hold state across the boundary
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts_us").alias("p_us")
    )
    pair = (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_us") > F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + 600_000_000),
        )
        .orderBy("c_us", "p_us", "user_id")
        .limit(1)
        .collect()
    )
    assert pair, "smoke data must contain a click->purchase pair"
    q1 = (pair[0].c_us + pair[0].p_us) // 2
    (q2,) = ev.approxQuantile("ts_us", [2 / 3], 0.0)
    ts_max = ev.agg(F.max("ts_us")).collect()[0][0]
    if q2 <= q1:
        q2 = (q1 + ts_max) // 2
    assert q1 < q2 < ts_max
    slices = [
        ev.filter(F.col("ts_us") <= q1),
        ev.filter((F.col("ts_us") > q1) & (F.col("ts_us") <= q2)),
        ev.filter(F.col("ts_us") > q2),
    ]
    for i, sl in enumerate(slices):
        stage = os.path.join(str(base), f"stage{i}")
        sl.drop("ts_us").coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(src, f"batch{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return {"path": src, "schema": ev.drop("ts_us").schema, "cuts": (q1, q2)}


def _factory(spark, sequenced_src, max_files=1):
    def make():
        reader = spark.readStream.schema(sequenced_src["schema"])
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        return reader.parquet(sequenced_src["path"])

    return make


def _n_batches(ckpt: str) -> int:
    offsets = os.path.join(ckpt, "offsets")
    return len([f for f in os.listdir(offsets) if not f.startswith(".")])


def test_interval_join_across_micro_batches(spark, tmp_path, sequenced_src):
    """Stream-stream interval join over 3 micro-batches: clicks buffered as
    join state in batch N must still match purchases arriving in batch N+1
    (within the 600 s window), and the appended union must equal the batch
    interval join exactly."""
    from wopen_spark.streaming.pipeline import available_now_interval_join

    ckpt = str(tmp_path / "ckpt_join")
    out = available_now_interval_join(
        spark,
        SF_SMOKE,
        ckpt,
        window_s=600,
        stream_factory=_factory(spark, sequenced_src),
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_us) for r in out.collect()
    }
    assert _n_batches(ckpt) >= 3

    ev = _events_batch(spark)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    expected = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_us)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 600 seconds")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
        )
        .collect()
    }
    assert expected, "smoke data must produce at least one click->purchase pair"
    # cross-batch evidence: some pair's click and purchase fall in
    # different source files (the join state crossed a batch boundary)
    q1, _ = sequenced_src["cuts"]
    crossing = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 600 seconds"))
            & (F.unix_micros("cts") <= q1)
            & (F.unix_micros("pts") > q1),
        ).collect()
    }
    assert got == expected
    assert crossing, "no pair spans the first batch boundary — test is weak"


def test_sessionization_state_survives_micro_batches(
    spark, tmp_path, sequenced_src
):
    """Stateful sessionization over 3 micro-batches: the carried open
    session must merge with the next batch's events (or close and emit).
    Reconciling emissions per (user, session_start) to their final state
    must reproduce the single-batch answer (itself oracle-matched in the
    gate) exactly — including which sessions are closed."""
    from wopen_spark.streaming.stateful import sessionize_available_now

    def run(ckpt, max_files):
        out = sessionize_available_now(
            spark,
            SF_SMOKE,
            ckpt,
            gap_seconds=1800,
            stream_factory=_factory(spark, sequenced_src, max_files=max_files),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id", "session_start").orderBy(
            F.desc("n_events"), F.desc("closed"), F.desc("session_end")
        )
        final = (
            out.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
        )
        return {
            (
                r.user_id,
                r.session_start,
                r.session_end,
                r.n_events,
                round(r.total_value, 2),
                r.closed,
            )
            for r in final.collect()
        }

    ckpt_multi = str(tmp_path / "ckpt_sess_multi")
    ckpt_single = str(tmp_path / "ckpt_sess_single")
    multi = run(ckpt_multi, max_files=1)
    assert _n_batches(ckpt_multi) >= 3
    single = run(ckpt_single, max_files=0)
    assert _n_batches(ckpt_single) == 1
    assert multi == single
    # the merge path was really exercised: some session spans the first
    # batch-boundary cut (started at-or-before it, ended after it)
    q1, _ = sequenced_src["cuts"]
    spanning = [
        s
        for s in multi
        if int(s[1].timestamp() * 1_000_000) <= q1
        and int(s[2].timestamp() * 1_000_000) > q1
    ]
    assert spanning, "no session spans the batch boundary — test is weak"


def test_live_rate_source_windowed_aggregate(spark, tmp_path):
    """LIVE streaming source (r4 'what's missing' #2): the built-in rate
    source generates rows continuously — unlike AvailableNow-over-a-file
    there is no finite input, so this exercises a genuinely unbounded
    micro-batch loop. A processing-time trigger runs several batches of a
    watermarked 1-second windowed count into a memory sink; the rate
    source emits exactly `rowsPerSecond` sequential values, so completed
    windows must each hold that many rows."""
    import time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .option("numPartitions", 2)
        .load()
    )
    agg = (
        stream.withWatermark("timestamp", "0 seconds")
        .groupBy(F.window("timestamp", "1 second").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_v"))
        .select(F.col("w.start").alias("ws"), "n", "max_v")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wopen_rate_smoke")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 45
        batches = 0
        while time.time() < deadline:
            time.sleep(1)
            progress = q.recentProgress
            batches = len(progress)
            rows = spark.table("wopen_rate_smoke").collect()
            # stop once several micro-batches ran and >=3 full windows exist
            if batches >= 3 and len(rows) >= 4:
                break
        assert q.isActive and q.exception() is None
        assert batches >= 3, "expected multiple live micro-batches"
    finally:
        q.stop()
    rows = sorted(spark.table("wopen_rate_smoke").collect(), key=lambda r: r.ws)
    # every window except the (possibly partial) first and last holds
    # exactly rowsPerSecond rows, and values are contiguous per second
    interior = rows[1:-1]
    assert interior, "need at least one completed interior window"
    assert all(r.n == 50 for r in interior), [(r.ws, r.n) for r in interior]


def test_rate_source_continuous_trigger_multibatch(spark, tmp_path):
    """LIVE unbounded source under a real processing-time trigger — the
    one mode AvailableNow-over-files never exercises. The windowed
    aggregate must survive multiple micro-batches of a continuously
    arriving stream, and its output schema must match the file-stream
    shape bit-for-bit."""
    import time

    from wopen_spark.streaming.pipeline import (
        _state_partitions,
        rate_stream,
        windowed_counts,
    )

    agg = windowed_counts(
        rate_stream(spark, rows_per_second=500, num_partitions=2),
        window="2 seconds",
        watermark="2 seconds",
    )
    with _state_partitions(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName("rate_windowed")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                done = [
                    p
                    for p in q.recentProgress
                    if p["numInputRows"] and p["numInputRows"] > 0
                ]
                if len(done) >= 2 and spark.table("rate_windowed").count() > 0:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
    out = spark.table("rate_windowed")
    assert [f.name for f in out.schema.fields] == [
        "window_start",
        "event_type",
        "n",
        "total_value",
    ]
    rows = out.collect()
    assert rows, "no windows produced by the live stream"
    assert len(done) >= 2, "expected >= 2 non-empty micro-batches"
    # keyed state is deterministic: only the three synthetic types appear
    assert {r.event_type for r in rows} <= {"click", "view", "purchase"}
    assert all(r.n > 0 for r in rows)


def test_event_stream_reads_table_directory_layout(spark, tmp_path):
    """Regression for the r7 sf1 oracle-gate catch: when events.parquet is
    a Spark-written table DIRECTORY (part-*.parquet leaves — the benchdata
    and production layout) rather than a single file, the old
    pathGlobFilter="events.parquet" over sf_dir matched zero leaf files
    and the stream silently produced 0 rows. event_stream must read the
    directory itself in that layout."""
    from wopen_spark.queries.registry import _t
    from wopen_spark.streaming.pipeline import event_stream

    sf_dir = str(tmp_path / "sfdir")
    _t(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    expected = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert expected > 0
    out = (
        event_stream(spark, sf_dir)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dir_layout_events")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from wopen_spark.streaming.pipeline import await_available_now

    await_available_now(q, timeout_s=120)
    got = spark.table("dir_layout_events").collect()
    assert got and got[0]["n"] == expected


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (not shipped here)",
)
def test_tws_sessionizer_matches_classic(spark, tmp_path):
    """Spark 4 successor API parity: the transformWithStateInPandas
    sessionizer shares _fold_sessions with the classic operator, so over
    the same static input both must emit identical session sets."""
    from wopen_spark.streaming.stateful import sessionize_available_now

    def rows(impl, ckpt):
        out = sessionize_available_now(
            spark, SF_SMOKE, str(tmp_path / ckpt), gap_seconds=1800, impl=impl
        )
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events,
             round(r.total_value, 2), r.closed)
            for r in out.collect()
        )

    assert rows("tws", "ckpt_tws") == rows("classic", "ckpt_classic")


def test_tws_sessionizer_errors_clearly_without_protobuf(spark):
    """Without protobuf the TWS operator must fail with a clear
    ImportError at construction — not a JVM-side runner crash mid-query."""
    if _has_protobuf():
        pytest.skip("protobuf present — the guard path is not reachable")
    from wopen_spark.streaming.stateful import sessionize_tws

    ev = spark.createDataFrame([(1, 0.0)], "user_id long, value double")
    with pytest.raises(ImportError, match="protobuf"):
        sessionize_tws(ev)
