"""Streaming corpus-filter stage: stateless prep filters on a stream.

The transform is row-wise and stateless, so streaming output must equal
the same filters applied in batch to the union of all fed micro-batches.
"""

import shutil
import tempfile

from hbase_rdf_spark.streaming.filters import filter_stream

SCHEMA = "doc_id long, text string"

ROWS_B1 = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away "
        "to the old stone bridge by the river in the quiet morning light"),
    (2, "spam spam spam spam spam spam spam spam"),          # repetitive
    (3, "x"),                                                # low quality
]
ROWS_B2 = [
    (4, "the small grey mouse hides under the warm wooden floor of the "
        "house near the garden wall write to a.b@c.example.org today and "
        "the sun sets slowly behind the tall green hills of the valley"),
]


def test_filter_stream_matches_batch(spark):
    src = tempfile.mkdtemp(prefix="fsrc_")
    ckpt = tempfile.mkdtemp(prefix="fckpt_")
    sink = tempfile.mkdtemp(prefix="fsink_")
    try:
        def feed(rows):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(SCHEMA).parquet(src)
            q = (
                filter_stream(stream, min_quality=0.35)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        feed(ROWS_B1)
        feed(ROWS_B2)
        streamed = {
            (r.doc_id, r.text)
            for r in spark.read.schema(SCHEMA).parquet(sink).collect()
        }
        batch = {
            (r.doc_id, r.text)
            for r in filter_stream(
                spark.createDataFrame(ROWS_B1 + ROWS_B2, SCHEMA),
                min_quality=0.35,
            ).collect()
        }
        assert streamed == batch
        assert {d for d, _ in streamed} == {1, 4}
        scrubbed = dict(streamed)[4]
        assert "<EMAIL>" in scrubbed and "a.b@" not in scrubbed
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)
