"""Benchmark harness — one JSON line to stdout.

Measures
1. the headline BASELINE.json metric: KG-construction throughput
   (triples extracted/sec) over a seed-deterministic synthetic
   transcript corpus sized to the SF dir, and
2. per-query wall seconds for every oracle-checked query in
   ``__spark_entry__.queries()`` at ``$SPARK_GRAFT_SF_DIR``
   (default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Scaling-efficiency protocol (north_rule's two-cluster-size criterion,
sandbox proxy): scripts/bench_scaling.py runs the identical build at
local[8] and local[32] and reports
efficiency = throughput(32) / (4 × throughput(8));
results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# conversations per SF for the construction benchmark (~11 turns,
# ~1.4 triples per non-tool turn each)
CONVS_PER_SF = 60_000  # sf0.1 → 6000 convs ≈ 66k turns ≈ 82k triples
WARMUP_CONVS = 300  # JIT/codegen warmup, mirroring the reference's
# 2-warmup-run protocol (reference: docs/amazon-benchmarking.md:5-17)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from hbase_rdf_spark.session import get_spark

    spark = get_spark(
        app_name="hbase-rdf-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from hbase_rdf_spark.pipeline import build_kg
    from hbase_rdf_spark.sources.synthetic import build_gazetteer, transcripts_df

    # --- 1. KG construction throughput --------------------------------
    n_convs = max(200, int(CONVS_PER_SF * sf))
    gaz = spark.createDataFrame(
        build_gazetteer(), "alias string, entity_id string, kind string"
    ).select("alias", "entity_id")

    warm_root = tempfile.mkdtemp(prefix="kgwarm_")
    data_dir = tempfile.mkdtemp(prefix="kgdata_")
    root = tempfile.mkdtemp(prefix="kgbench_")
    try:
        # corpus to parquet first (untimed): the pipeline under test READS
        # transcripts from columnar storage per the input contract
        transcripts_df(spark, n_convs, seed=42).write.mode("overwrite").parquet(
            data_dir
        )
        transcripts = spark.read.parquet(data_dir)
        # warmup: compiles every codegen stage once (cold-JIT cost is
        # constant, not throughput)
        build_kg(
            spark, transcripts_df(spark, WARMUP_CONVS, seed=1), gaz, warm_root,
            input_sig=f"warmup:{WARMUP_CONVS}:1",
        )
        # best-of-2: the sandbox host is shared and identical runs vary
        # up to 4x in wall time — a single sample is not a measurement
        build_sec, triples = None, 0
        for i in range(2):
            r = tempfile.mkdtemp(prefix=f"kgbench{i}_")
            try:
                t0 = time.time()
                stats = build_kg(
                    spark, transcripts, gaz, r,
                    input_sig=f"synth:{n_convs}:42:{i}",
                )
                dt = time.time() - t0
            finally:
                shutil.rmtree(r, ignore_errors=True)
            if build_sec is None or dt < build_sec:
                build_sec = dt
                triples = stats["resolved_triples"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(warm_root, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)

    # --- 2. per-query timings (1 warmup + 1 measured, per reference
    # harness protocol) ---------------------------------------------------
    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        fn(spark, sf_dir).count()  # warmup evaluation
        t0 = time.time()
        n = fn(spark, sf_dir).count()  # measured full evaluation
        qtimes[name] = round(time.time() - t0, 3)
        _ = n

    out = {
        "metric": "kg_build_seconds",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "build": {
            "n_convs": n_convs,
            "triples": triples,
            "triples_per_sec": round(triples / build_sec, 1),
            "cpus": cpus,
        },
    }
    scaling = _latest_scaling_record()
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


def _latest_scaling_record() -> dict | None:
    """Surface the newest BENCH/BASELINE.md scaling entry (efficiency +
    the measured hardware ceiling) so one JSON line carries both the
    throughput metric and the north_rule scaling evidence."""
    import re

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    if not os.path.exists(path):
        return None
    text = open(path).read()
    effs = re.findall(r"\*\*Scaling efficiency\*\*[^*]*\*\*([0-9.]+)\*\*", text)
    pairs = re.findall(r"tps\((\d+)\) / \(([0-9.]+) x tps\((\d+)\)\)", text)
    ceils = re.findall(r"efficiency at ~([0-9]+(?:\.[0-9]+)?)", text)
    if not effs:
        return None
    rec: dict = {"efficiency": float(effs[-1])}
    if pairs:
        big, _factor, small = pairs[-1]
        rec["legs"] = [int(small), int(big)]
    if ceils:
        rec["hw_efficiency_ceiling"] = float(ceils[-1])
    return rec


if __name__ == "__main__":
    main()
