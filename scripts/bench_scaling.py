"""Two-cluster-size scaling benchmark (north_rule criterion).

Sandbox proxy for N vs 4N EXECUTORS: the identical spark-submit job on
``local-cluster[E,2,4096]`` with E and 4E executor processes —
each executor its own JVM with the same 2 cores / same heap / same GC,
exactly like adding worker nodes; efficiency =
throughput(4E) / (4 × throughput(E)). Results append to
``BENCH/BASELINE.md``.

Why not ``local[N]`` vs ``local[4N]``: local mode caps TASK SLOTS
only. GC, shuffle writers, parquet compression, netty and py4j spill
onto idle host cores, so the small leg silently borrows 2-4 extra
cores of a single shared JVM and the measured ratio tracks that
subsidy, not the code (observed 0.48-0.70 on a quiet host with
code-identical legs). Separate executor JVMs remove the shared-heap
confound: per-executor aux threads are the SAME on both legs.

Methodology notes (recorded with every run):

- The sandbox host is SHARED: wall-clock variance between identical
  runs reaches 2x. Each leg therefore reports the best of
  ``RUNS_PER_LEG`` timed runs (after a JIT warmup), and the raw
  parallel-CPU capacity of the host is probed alongside so the
  efficiency number can be read against what the hardware can give.
- Legs are given in TOTAL CORES (2 cores/executor): ``bench_scaling.py
  300000 2 8`` runs 1 executor vs 4 executors.

Usage: python scripts/bench_scaling.py [n_convs] [cores_small] [cores_big]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_capacity_probe(procs: int, n: int = 6_000_000) -> float:
    """Speedup of `procs` parallel pure-CPU burns vs one (ideal: procs)."""
    t0 = time.time()
    _burn(n)
    base = time.time() - t0
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [n] * procs)
    return round(procs * base / (time.time() - t0), 1)


def make_pyfiles_zip() -> str:
    """Package hbase_rdf_spark for --py-files (the deployment artifact
    a real cluster run ships)."""
    path = os.path.join(REPO, "_tmp", "hbase_rdf_spark.zip")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with zipfile.ZipFile(path, "w") as z:
        for dirpath, _dirs, files in os.walk(os.path.join(REPO, "hbase_rdf_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


CORES_PER_EXEC = 2
EXEC_MEM_MB = 4096


def gen_corpus(n_convs: int, pyz: str) -> str:
    """Pre-generate the benchmark corpus ONCE at full host parallelism
    (untimed scaffolding — the legs read it; pure-Python row generation
    would otherwise dominate the small leg's wall clock at 2M convs)."""
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = os.path.join(
        shm or os.path.join(REPO, "_tmp"), f"scalecorpus_{n_convs}"
    )
    if os.path.isfile(os.path.join(out, "_SUCCESS")):
        return out
    cmd = [
        "spark-submit",
        "--master", "local[12]",
        "--driver-memory", "8g",
        "--py-files", pyz,
        os.path.join(REPO, "scripts", "scaling_runner.py"),
        "--gen", str(n_convs), out, "64",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3000)
    if not os.path.isfile(os.path.join(out, "_SUCCESS")):
        raise RuntimeError(
            f"corpus generation failed:\n{r.stdout[-1500:]}\n{r.stderr[-1500:]}"
        )
    return out


def run_leg(cores: int, n_convs: int, pyz: str, corpus: str) -> dict:
    # E separate executor JVMs × 2 cores each — adding executors is the
    # thing the north rule scales, and per-executor aux threads
    # (GC/shuffle/parquet/netty) stay constant across legs.
    n_execs = max(1, cores // CORES_PER_EXEC)
    # Shuffle scratch goes to tmpfs when the host has one: the sandbox
    # runs every executor against ONE virtual block device, so at 4
    # executors the shuffle+write traffic serializes on a resource a
    # real cluster scales per-node (each worker its own disks). tmpfs
    # restores the per-node-disk assumption; both legs use the same
    # medium, so the comparison stays fair.
    local_dir = (
        f"/dev/shm/spark_scaling_{cores}"
        if os.path.isdir("/dev/shm")
        else ""
    )
    cmd = [
        "spark-submit",
        "--master", f"local-cluster[{n_execs},{CORES_PER_EXEC},{EXEC_MEM_MB}]",
        "--driver-memory", "8g",
        "--conf", "spark.executor.memory=3g",
        *(["--conf", f"spark.local.dir={local_dir}"] if local_dir else []),
        "--py-files", pyz,
        os.path.join(REPO, "scripts", "scaling_runner.py"),
        str(n_execs * CORES_PER_EXEC), str(n_convs), corpus,
    ]
    # generous: a 2-core leg at 2M convs (corpus gen + warmup +
    # best-of-3 timed builds) legitimately needs ~40 min
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=6000
        )
    finally:
        if local_dir.startswith("/dev/shm/"):
            import shutil as _sh

            _sh.rmtree(local_dir, ignore_errors=True)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"tps"' in line:
            return json.loads(line)
    raise RuntimeError(f"no result line from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    factor = n_big / n_small
    pyz = make_pyfiles_zip()
    corpus = gen_corpus(n_convs, pyz)
    cap_small = cpu_capacity_probe(n_small)
    cap_big = cpu_capacity_probe(n_big)
    try:
        r_small = run_leg(n_small, n_convs, pyz, corpus)
        r_big = run_leg(n_big, n_convs, pyz, corpus)
    finally:
        import shutil as _sh

        _sh.rmtree(corpus, ignore_errors=True)
    eff = r_big["tps"] / (factor * r_small["tps"])
    hw_ceiling = round(cap_big / cap_small / factor, 3)
    e_small = max(1, n_small // CORES_PER_EXEC)
    e_big = max(1, n_big // CORES_PER_EXEC)
    result = {
        "n_convs": n_convs,
        f"execs{e_small}": r_small,
        f"execs{e_big}": r_big,
        "scaling_efficiency": round(eff, 3),
        "cpu_capacity": {f"procs{n_small}": cap_small, f"procs{n_big}": cap_big,
                         "hw_efficiency_ceiling": hw_ceiling},
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (n_convs={n_convs}, {r_small['triples']} triples,"
            f" local-cluster {CORES_PER_EXEC} cores/executor)\n\n"
            f"| cluster size | wall s | triples/s |\n|---|---|---|\n"
            f"| {e_small} executor(s) ({n_small} cores) | {r_small['seconds']} | {r_small['tps']} |\n"
            f"| {e_big} executor(s) ({n_big} cores) | {r_big['seconds']} | {r_big['tps']} |\n\n"
            f"**Scaling efficiency** = tps({e_big} execs) / ({factor:g} x "
            f"tps({e_small} execs)) = **{eff:.3f}** (target >= 0.8, north_rule)\n\n"
            f"Host capacity probe: {n_small} parallel CPU burns reach "
            f"{cap_small}x speedup, {n_big} reach {cap_big}x → the hardware "
            f"itself caps {n_small}→{n_big} efficiency at ~{hw_ceiling}.\n"
            + (
                f"\nDictionary collision audit: PASSED in both legs "
                f"({r_big['collision_audit']['distinct_terms']} distinct "
                f"terms, zero xxhash64 id collisions — asserted inside "
                f"every timed build by assert_no_id_collisions).\n"
                if r_big.get("collision_audit", {}).get("passed")
                and r_small.get("collision_audit", {}).get("passed")
                else "\nDictionary collision audit: MISSING from leg "
                "output — investigate before trusting this run.\n"
            )
        )


if __name__ == "__main__":
    main()
