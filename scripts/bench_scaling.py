"""Two-cluster-size scaling benchmark (north_rule criterion).

Sandbox proxy for N vs 4N executors: the identical spark-submit job at
``local[N]`` and ``local[4N]`` over the same input; efficiency =
throughput(4N) / (4 × throughput(N)). Results are appended to
``BENCH/BASELINE.md``.

Methodology notes (recorded with every run):

- The sandbox host is SHARED: wall-clock variance between identical
  runs reaches 2x. Each leg therefore reports the best of
  ``RUNS_PER_LEG`` timed runs (after a JIT warmup), and the raw
  parallel-CPU capacity of the host is probed alongside so the
  efficiency number can be read against what the hardware can give
  (e.g. 32 logical CPUs that sustain only ~12-16 procs of throughput
  cap ANY 8→32 efficiency at ~0.4-0.5 regardless of the code).
- Default legs are 8 and 32 (the driver's convention). Pass explicit
  legs to measure within physical capacity: ``bench_scaling.py 60000 4
  16``.

Usage: python scripts/bench_scaling.py [n_convs] [n_small] [n_big]
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


def run_leg(cores: int, n_convs: int, pyz: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--py-files", pyz,
        os.path.join(REPO, "scripts", "scaling_runner.py"),
        str(cores), str(n_convs),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3000
    )
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
    cap_small = cpu_capacity_probe(n_small)
    cap_big = cpu_capacity_probe(n_big)
    r_small = run_leg(n_small, n_convs, pyz)
    r_big = run_leg(n_big, n_convs, pyz)
    eff = r_big["tps"] / (factor * r_small["tps"])
    hw_ceiling = round(cap_big / cap_small / factor, 3)
    result = {
        "n_convs": n_convs,
        f"local{n_small}": r_small,
        f"local{n_big}": r_big,
        "scaling_efficiency": round(eff, 3),
        "cpu_capacity": {f"procs{n_small}": cap_small, f"procs{n_big}": cap_big,
                         "hw_efficiency_ceiling": hw_ceiling},
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (n_convs={n_convs}, {r_small['triples']} triples)\n\n"
            f"| parallelism | wall s | triples/s |\n|---|---|---|\n"
            f"| local[{n_small}]  | {r_small['seconds']} | {r_small['tps']} |\n"
            f"| local[{n_big}] | {r_big['seconds']} | {r_big['tps']} |\n\n"
            f"**Scaling efficiency** = tps({n_big}) / ({factor:g} x tps({n_small})) = "
            f"**{eff:.3f}** (target >= 0.8, north_rule)\n\n"
            f"Host capacity probe: {n_small} parallel CPU burns reach "
            f"{cap_small}x speedup, {n_big} reach {cap_big}x → the hardware "
            f"itself caps {n_small}→{n_big} efficiency at ~{hw_ceiling}.\n"
        )


if __name__ == "__main__":
    main()
