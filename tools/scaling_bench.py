"""Scaling-efficiency evidence for the north rule (N → 4N executors).

No real cluster exists in this sandbox, so cluster scaling is evidenced by
running the IDENTICAL extraction job on the SAME materialized corpus at
two parallelism levels — local[8] and local[32] — in separate processes
(fresh JVM each), reporting docs/sec at both and

    efficiency = (throughput_32 / throughput_8) / 4.

Writes/updates the "Measured scaling" section consumed by BENCH.md and
prints one JSON line.

Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_DOCS=str(n_docs),
        SPARK_GRAFT_BENCH_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    results = {}
    for cpus in (8, 32):
        r = run_bench(cpus, n_docs)
        results[cpus] = r
        print(
            f"# local[{cpus}]: {r['extraction']['docs_per_sec']} docs/s, "
            f"{r['extraction']['mb_per_sec']} MB/s, wall {r['value']}s",
            file=sys.stderr,
        )
    t8 = results[8]["extraction"]["docs_per_sec"]
    t32 = results[32]["extraction"]["docs_per_sec"]
    eff = (t32 / t8) / 4.0
    summary = {
        "n_docs": n_docs,
        "local8_docs_per_sec": t8,
        "local32_docs_per_sec": t32,
        "local8_wall_sec": results[8]["value"],
        "local32_wall_sec": results[32]["value"],
        "local8_mb_per_sec": results[8]["extraction"]["mb_per_sec"],
        "local32_mb_per_sec": results[32]["extraction"]["mb_per_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
