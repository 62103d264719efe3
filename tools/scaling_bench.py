"""Scaling-efficiency evidence (north_rule): the same extraction job at two
parallelism levels — local[8] (N) vs local[32] (4N) — on the SAME input.
Sandbox stand-in for N vs 4N executor clusters (BASELINE.md).

efficiency = (throughput_32 / throughput_8) / 4      (target ≥ 0.8)

Each level runs in its own subprocess (a JVM's master is fixed at startup).
Writes results into BENCH.md and prints one JSON line.

Usage: python tools/scaling_bench.py [n_pages] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from medical_vector_database_ocr_ner_spark.session import get_spark
from medical_vector_database_ocr_ner_spark.sources.pages import pages_path
from medical_vector_database_ocr_ner_spark.operators.extraction import extract_documents

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); repeats = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
pages = spark.read.parquet(pages_path(n_pages))
pages.count()  # warm scan
# warm-up extraction (JIT + python workers), then measured repeats
extract_documents(pages, num_partitions=cpus * 4).count()
best = None
for _ in range(repeats):
    t0 = time.time()
    n = extract_documents(pages, num_partitions=cpus * 4).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": cpus, "n_pages": n_pages, "sec": round(best, 3),
                  "docs_per_sec": round(n_pages / best, 1)}))
"""


def run_level(cpus: int, n_pages: int, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_pages), str(repeats)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    r8 = run_level(8, n_pages, repeats)
    r32 = run_level(32, n_pages, repeats)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {
        "n_pages": n_pages,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
