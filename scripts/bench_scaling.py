"""Two-cluster-size scaling benchmark (north_rule criterion).

Sandbox proxy for N vs 4N executors: the identical spark-submit job at
``local[8]`` and ``local[32]`` over the same input; efficiency =
throughput(32) / (4 × throughput(8)). Results are appended to
``BENCH/BASELINE.md``.

Usage: python scripts/bench_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    pyz = make_pyfiles_zip()
    r8 = run_leg(8, n_convs, pyz)
    r32 = run_leg(32, n_convs, pyz)
    eff = r32["tps"] / (4 * r8["tps"])
    result = {
        "n_convs": n_convs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (n_convs={n_convs}, {r8['triples']} triples)\n\n"
            f"| parallelism | wall s | triples/s |\n|---|---|---|\n"
            f"| local[8]  | {r8['seconds']} | {r8['tps']} |\n"
            f"| local[32] | {r32['seconds']} | {r32['tps']} |\n\n"
            f"**Scaling efficiency** = tps(32) / (4 x tps(8)) = "
            f"**{eff:.3f}** (target >= 0.8, north_rule)\n"
        )


if __name__ == "__main__":
    main()
