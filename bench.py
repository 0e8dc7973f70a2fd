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
    regressions = _write_query_deltas(qtimes, sf)
    if regressions is not None:
        out["regressions_vs_prev_round"] = regressions

    # Full record (all queries + regressions) to a stable file path.
    base = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(base, "BENCH"), exist_ok=True)
    with open(os.path.join(base, "BENCH", "last_run.json"), "w") as f:
        json.dump(out, f, indent=1)

    # The driver captures only the LAST 2000 chars of stdout; a JSON
    # line longer than that loses its head and fails to parse (that is
    # what nulled BENCH_r02's `parsed`). Emit a compact line whose
    # "queries" covers the driver's 50-entry correctness window and
    # shrink further if needed; the complete map lives in
    # BENCH/last_run.json.
    slim = dict(out)
    slim.pop("regressions_vs_prev_round", None)
    slim["queries_full"] = "BENCH/last_run.json"
    names = list(qtimes)
    # seed with the minimal (empty-queries) line so the print below can
    # never NameError on empty qtimes, and never emit a stale over-long
    # candidate if the shrink loop exhausts (ADVICE r3, low)
    slim["queries"] = {}
    line = json.dumps(slim, separators=(",", ":"))
    keep = min(50, len(names))
    while keep > 0:
        candidate_map = {n: qtimes[n] for n in names[:keep]}
        candidate = json.dumps(
            {**slim, "queries": candidate_map}, separators=(",", ":")
        )
        if len(candidate) <= 1900:
            slim["queries"], line = candidate_map, candidate
            break
        keep -= 5
    print(line)


_DELTA_START = "<!-- bench-delta:start -->"
_DELTA_END = "<!-- bench-delta:end -->"


def _write_query_deltas(qtimes: dict[str, float], sf: float) -> list | None:
    """Diff per-query timings against the newest driver-recorded
    BENCH_r*.json and rewrite the delta table in BENCH/BASELINE.md
    (between markers, so reruns replace rather than append). Returns
    the list of >1.5× regressions, or None when no prior round exists.

    Caveat printed into the table: the host is shared, identical runs
    vary ~2× in wall time — a flagged ratio is a PROMPT to re-measure,
    not proof of a regression.
    """
    import glob
    import re

    base = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(base, "BENCH_r*.json")))
    if not files:
        return None
    prev_file = files[-1]
    try:
        rec = json.load(open(prev_file))
        prev = rec.get("queries")
        if prev is None and isinstance(rec.get("parsed"), dict):
            prev = rec["parsed"].get("queries")
        if prev is None:
            # the driver wraps the bench stdout inside a "tail" string —
            # recover the embedded JSON line, or (when the line itself
            # was head-truncated by the 2000-char tail window, as in
            # BENCH_r02) scrape the surviving "name": float pairs and
            # keep the ones that are real query names
            tail = rec.get("tail", "")
            m = re.search(r'\{"metric".*\}', tail)
            if m:
                prev = json.loads(m.group(0)).get("queries", {})
            else:
                import __spark_entry__ as entrymod
                known = set(entrymod.queries())
                prev = {
                    k: float(v)
                    for k, v in re.findall(
                        r'\\?"(\w+)\\?":\s*([0-9]+\.[0-9]+)', tail)
                    if k in known
                }
        # richer fallback: our own full record from the previous round
        last = os.path.join(base, "BENCH", "last_run.json")
        if not prev and os.path.exists(last):
            prev = json.load(open(last)).get("queries", {})
    except Exception:
        return None
    lines = [
        _DELTA_START,
        f"## Per-query delta vs {os.path.basename(prev_file)} (sf{sf})",
        "",
        "Shared-host caveat: identical runs vary ~2× in wall time;",
        "a flagged row means re-measure, not proven regression.",
        "",
        "| query | prev s | now s | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    regressions = []
    for name in sorted(qtimes):
        t = qtimes[name]
        p = prev.get(name)
        if p is None:
            lines.append(f"| {name} | — | {t:.3f} | — | new |")
            continue
        ratio = t / p if p > 0 else float("inf")
        flag = ">1.5x REGRESSION" if ratio > 1.5 else ""
        if flag:
            regressions.append({"query": name, "prev": p, "now": t,
                                "ratio": round(ratio, 2)})
        lines.append(
            f"| {name} | {p:.3f} | {t:.3f} | {ratio:.2f} | {flag} |"
        )
    block = "\n".join(lines) + "\n" + _DELTA_END
    md_path = os.path.join(base, "BENCH", "BASELINE.md")
    text = open(md_path).read() if os.path.exists(md_path) else ""
    if _DELTA_START in text and _DELTA_END in text:
        head, rest = text.split(_DELTA_START, 1)
        _, tail = rest.split(_DELTA_END, 1)
        text = head + block + tail
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(md_path, "w") as f:
        f.write(text)
    return regressions


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
