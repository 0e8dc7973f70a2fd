"""End-to-end LLM training-data preparation over the test corpus.

    python examples/training_data_prep.py   # ~1 min on local[8]

Runs the full corpus-prep pipeline (exact dedup → MinHash near-dedup →
quality/repetition filters → benchmark decontamination → PII scrub →
mixture sampling → shard assignment) over the sf0.001 documents table
and prints the per-stage survivor counts — the same composition a
100 TB pretraining pipeline runs, at demo scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_rdf_spark.ops.prep import prep_training_data
    from hbase_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="training-data-prep", master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # stand-in benchmark/eval set: a deterministic held-out slice
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    sources = [r[0] for r in corpus.select("source").distinct().collect()]
    mixture = {s: 0.9 for s in sources}  # keep 90% of every source

    out, stats = prep_training_data(
        corpus,
        bench=bench,
        minhash_threshold=0.7,
        min_quality=0.2,
        max_top_2gram_frac=0.6,
        contamination_threshold=0.08,
        mixture=mixture,
        n_shards=4,
        collect_stats=True,
    )

    print("\nper-stage survivors:")
    for stage, n in stats.items():
        print(f"  {stage:<16} {n}")
    print("\nshard sizes:")
    out.groupBy("shard_id").count().orderBy("shard_id").show()
    print("sample rows:")
    out.select("doc_id", "source", "shard_id", "shard_pos").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
