"""Streaming exact dedup (dropDuplicatesWithinWatermark) vs batch.

Same feeding protocol as test_stateful_streaming: sequential
``availableNow`` runs over a growing parquet dir with one shared
checkpoint, so watermark advancement across runs is deterministic.
"""

import shutil
import tempfile
from datetime import datetime, timedelta

from hbase_rdf_spark.ops.dedup import dedup_exact
from hbase_rdf_spark.streaming.dedup import dedup_stream

T0 = datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = "doc_id string, text string, ts timestamp"


class _Feeder:
    def __init__(self, spark, delay="1 hour"):
        self.spark = spark
        self.delay = delay
        self.src = tempfile.mkdtemp(prefix="ddsrc_")
        self.ckpt = tempfile.mkdtemp(prefix="ddckpt_")
        self.sink = tempfile.mkdtemp(prefix="ddsink_")

    def feed(self, rows):
        if rows:
            self.spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(self.src)
        stream = self.spark.readStream.schema(SCHEMA).parquet(self.src)
        out = dedup_stream(stream, delay=self.delay)
        q = (
            out.writeStream.format("parquet")
            .option("path", self.sink)
            .option("checkpointLocation", self.ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def emitted(self):
        return {
            (r.doc_id, r.text)
            for r in self.spark.read.schema(SCHEMA).parquet(self.sink).collect()
        }

    def cleanup(self):
        for d in (self.src, self.ckpt, self.sink):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_drops_cross_batch_duplicates(spark):
    feeder = _Feeder(spark)
    try:
        # batch 1: two distinct docs + an in-batch duplicate of A
        feeder.feed(
            [
                ("d1", "alpha beta", T0),
                ("d2", "gamma", T0 + timedelta(minutes=1)),
                ("d3", "alpha beta", T0 + timedelta(minutes=2)),
            ]
        )
        # batch 2 (within the 1h horizon): duplicate of A again + new doc
        feeder.feed(
            [
                ("d4", "alpha beta", T0 + timedelta(minutes=30)),
                ("d5", "delta", T0 + timedelta(minutes=31)),
            ]
        )
        got = feeder.emitted()
    finally:
        feeder.cleanup()
    texts = sorted(t for _, t in got)
    assert texts == ["alpha beta", "delta", "gamma"]
    # the FIRST arrival is the survivor
    assert ("d1", "alpha beta") in got


def test_stream_dedup_matches_batch_survivor_keyspace(spark):
    """Rows surviving the stream pass are a superset-consistent input to
    the batch pass: batch-deduping the stream output is a no-op here."""
    rows = [
        ("a", "x y z", T0),
        ("b", "x y z", T0 + timedelta(minutes=5)),
        ("c", "q", T0 + timedelta(minutes=6)),
    ]
    feeder = _Feeder(spark)
    try:
        feeder.feed(rows)
        got = feeder.emitted()
    finally:
        feeder.cleanup()
    sdf = spark.createDataFrame(
        [(d, t, None) for d, t in got], "doc_id string, text string, ts timestamp"
    )
    rebatch = {(r.doc_id, r.text) for r in dedup_exact(sdf).collect()}
    assert rebatch == got == {("a", "x y z"), ("c", "q")}
