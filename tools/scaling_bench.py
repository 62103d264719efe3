"""Scaling-efficiency evidence (north_rule): the same extraction job at two
parallelism levels on the SAME input — the sandbox stand-in for N vs 4N
executor clusters (BASELINE.md).

efficiency(N→4N) = (throughput_4N / throughput_N) / 4      (target ≥ 0.8)

Measures TWO pairs by default: local[4]→local[16] and local[8]→local[32].
The 8→32 pair saturates the 32-core host, so it also carries the ceiling of
the hardware itself (a pure-Python multiprocessing control of the same
per-doc work measures ~0.80 at 8→32 procs on this box); 4→16 shows the
framework's scaling with headroom left. Tuning that matters (see BENCH.md):
num_partitions = 8×cores so the salted-shuffle waves stay balanced under
per-document cost skew; Arrow batches of 16k rows.

Each level runs in its own subprocess (a JVM's master is fixed at startup).
Prints one JSON line.

Usage: python tools/scaling_bench.py [n_pages] [repeats] [pairs like 4,16 8,32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from medical_vector_database_ocr_ner_spark.session import get_spark
from medical_vector_database_ocr_ner_spark.sources.pages import pages_path
from medical_vector_database_ocr_ner_spark.operators.extraction import extract_documents

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); repeats = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "16384"})
pages = spark.read.parquet(pages_path(n_pages))
pages.count()  # warm scan
kw = dict(num_partitions=cpus * 8)  # small tasks: straggler-resistant waves
extract_documents(pages, **kw).count()  # warm JIT + python workers
best = None
for _ in range(repeats):
    t0 = time.time()
    extract_documents(pages, **kw).count()
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
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pairs = [tuple(map(int, p.split(","))) for p in sys.argv[3:]] or [(4, 16), (8, 32)]

    # INTERLEAVED rounds (round-2 noise protocol): on a shared host, a
    # level measured in one contiguous block inherits whatever co-tenant
    # load existed during ITS minutes — ratios between blocks then measure
    # the neighbors, not the framework. Each round instead runs every
    # level back-to-back (1 in-process repeat, fresh JVM each sample) and
    # the per-level best-of-rounds is taken, so the compared numbers come
    # from adjacent time windows.
    order: list[int] = []
    for lo, hi in pairs:
        for c in (lo, hi):
            if c not in order:
                order.append(c)
    samples: dict[int, list[dict]] = {c: [] for c in order}
    for _ in range(repeats):
        for c in order:
            samples[c].append(run_level(c, n_pages, 1))
    levels = {
        c: max(samples[c], key=lambda s: s["docs_per_sec"]) for c in order
    }
    for c in order:
        levels[c]["all_docs_per_sec"] = [
            s["docs_per_sec"] for s in samples[c]
        ]

    result = {"n_pages": n_pages,
              "levels": {str(c): levels[c] for c in sorted(levels)},
              "pairs": {}}
    overall = True
    for lo, hi in pairs:
        eff = (levels[hi]["docs_per_sec"] / levels[lo]["docs_per_sec"]) / (hi / lo)
        result["pairs"][f"{lo}->{hi}"] = {
            "scaling_efficiency": round(eff, 3), "target": 0.8, "pass": eff >= 0.8,
        }
        overall = overall and eff >= 0.8
    result["pass"] = overall
    print(json.dumps(result))


if __name__ == "__main__":
    main()
