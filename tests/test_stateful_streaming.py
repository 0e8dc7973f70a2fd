"""Streaming sessionization (applyInPandasWithState) vs the batch gap
rule.

Feeding protocol: files are fed in event-time order across SEQUENTIAL
``availableNow`` runs sharing one checkpoint — each run's batch sees
the watermark produced by the previous runs, which makes watermark
advancement (and therefore which sessions finalize when) fully
deterministic. Within one run events may still be unordered; the
operator buffers and sorts.
"""

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window, functions as F

from hbase_rdf_spark.streaming.stateful import sessionize_stream

GAP = 1800
T0 = datetime(2024, 1, 1, 0, 0, 0)


def _event_rows():
    rows = []
    # u1: 3 sessions (gaps 2h); u2: 1 long session; u3: single event
    for i in range(9):
        rows.append(("u1", T0 + timedelta(seconds=(i // 3) * 7200 + (i % 3) * 60)))
    for i in range(5):
        rows.append(("u2", T0 + timedelta(seconds=i * 1700)))
    rows.append(("u3", T0 + timedelta(seconds=123, microseconds=456789)))
    # boundary: exactly gap → same session; gap+1us → new session
    rows.append(("u4", T0))
    rows.append(("u4", T0 + timedelta(seconds=GAP)))
    rows.append(("u4", T0 + timedelta(seconds=2 * GAP, microseconds=1)))
    return rows


def _batch_sessions(spark, ev):
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn(
        "s_idx",
        F.sum(
            F.when(gap.isNull() | (gap > GAP * 1_000_000), 1).otherwise(0)
        ).over(w),
    )
    return (
        sess.groupBy("user_id", "s_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


class _Feeder:
    """Sequential availableNow runs over a growing parquet dir with a
    shared checkpoint — the deterministic stand-in for a live stream."""

    def __init__(self, spark, watermark):
        self.spark = spark
        self.watermark = watermark
        self.src = tempfile.mkdtemp(prefix="sessrc_")
        self.ckpt = tempfile.mkdtemp(prefix="sesckpt_")
        self.sink = tempfile.mkdtemp(prefix="sessink_")
        self.emitted = set()

    def feed(self, rows):
        if rows:
            self.spark.createDataFrame(
                rows, "user_id string, ts timestamp"
            ).coalesce(1).write.mode("append").parquet(self.src)
        stream = (
            self.spark.readStream.schema("user_id string, ts timestamp")
            .parquet(self.src)
        )
        out = sessionize_stream(
            stream, gap_seconds=GAP, watermark=self.watermark
        )
        # a FILE sink: the memory sink refuses checkpoint recovery, and
        # recovery across runs is the whole feeding protocol
        q = (
            out.writeStream.format("parquet")
            .option("path", self.sink)
            .option("checkpointLocation", self.ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        total = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in self.spark.read.schema(
                "user_id string, session_start timestamp, "
                "session_end timestamp, n_events long"
            ).parquet(self.sink).collect()
        }
        new = total - self.emitted
        self.emitted = total
        return new

    def cleanup(self):
        shutil.rmtree(self.src, ignore_errors=True)
        shutil.rmtree(self.ckpt, ignore_errors=True)
        shutil.rmtree(self.sink, ignore_errors=True)


def test_streaming_sessions_match_batch(spark):
    rows = sorted(_event_rows(), key=lambda r: r[1])
    # 4 event-time-ordered chunks + a late sentinel that drags the
    # watermark far past every real session's close point
    chunks = [rows[:4], rows[4:9], rows[9:14], rows[14:]]
    sentinel_ts = T0 + timedelta(days=2)
    feeder = _Feeder(spark, watermark="0 seconds")
    try:
        for c in chunks:
            feeder.feed(c)
        feeder.feed([("zz", sentinel_ts)])
        # one more run so the sentinel-advanced watermark fires timeouts
        feeder.feed([("zz", sentinel_ts + timedelta(seconds=1))])
        got = feeder.emitted
    finally:
        feeder.cleanup()

    ev = spark.createDataFrame(_event_rows(), "user_id string, ts timestamp")
    batch = _batch_sessions(spark, ev).collect()
    # every real user's session closes < sentinel watermark → all emit;
    # only the sentinel user's own session stays open
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch
    }
    got_real = {g for g in got if g[0] != "zz"}
    assert got_real == want
    # u1: 3 sessions of 3 events; u4 boundary: exactly-gap stayed in
    # session 1 (2 events), +1us opened session 2
    u1 = [g for g in got_real if g[0] == "u1"]
    assert len(u1) == 3 and all(g[3] == 3 for g in u1)
    u4 = sorted(
        [g for g in got_real if g[0] == "u4"], key=lambda g: g[1]
    )
    assert [g[3] for g in u4] == [2, 1]


def test_streaming_out_of_order_within_run_bridges_sessions(spark):
    """Events that arrive ACROSS runs out of order but inside the
    watermark allowance still merge into one session — the buffered
    design's whole point (eager gap-emission would split them)."""
    feeder = _Feeder(spark, watermark="3 hours")
    try:
        # run 1: two events 50min apart (gap > 30min → would split
        # eagerly), run 2 delivers the bridging event BETWEEN them
        feeder.feed([
            ("uA", T0),
            ("uA", T0 + timedelta(minutes=50)),
        ])
        feeder.feed([("uA", T0 + timedelta(minutes=25))])
        # sentinel advances the watermark (3h delay) past the close
        feeder.feed([("zz", T0 + timedelta(hours=9))])
        got = feeder.feed([("zz", T0 + timedelta(hours=9, seconds=2))])
    finally:
        feeder.cleanup()
    merged = {g for g in feeder.emitted if g[0] == "uA"}
    assert merged == {
        ("uA", T0, T0 + timedelta(minutes=50), 3)
    }


def test_streaming_session_event_time_timeout(spark):
    """An idle user's buffered session finalizes via event-time timeout
    once OTHER users' events push the watermark past last + gap."""
    feeder = _Feeder(spark, watermark="0 seconds")
    try:
        got1 = feeder.feed([("uX", T0), ("uX", T0 + timedelta(seconds=60))])
        got2 = feeder.feed([("uY", T0 + timedelta(hours=10))])
        got3 = feeder.feed([("uY", T0 + timedelta(hours=10, seconds=60))])
    finally:
        feeder.cleanup()
    assert got1 == set()
    # run 2 moves the watermark to t0+10h, far past uX's last+gap; the
    # timeout fires in run 2's trailing no-data batch (Spark runs one
    # after a watermark advance) or at the latest in run 3
    assert ("uX", T0, T0 + timedelta(seconds=60), 2) in got2 | got3


def test_streaming_session_rejects_batch_df(spark):
    ev = spark.createDataFrame(_event_rows(), "user_id string, ts timestamp")
    with pytest.raises(Exception):
        sessionize_stream(ev).explain()
