"""Definitive same-window scaling measurement: alternates a pure-CPU
integer-burn control with the Spark extraction job at each parallelism
level, so the host's occupancy-dependent per-core throughput (shared-box
throttling: ~30% per-core drop when all 32 cores are busy, invisible in
/proc/cpuinfo which reports a fixed virtual MHz) is measured in the SAME
minutes as the Spark numbers it normalizes.

Reported per pair (N, 4N):
- spark_efficiency          = (spark_4N / spark_N) / 4
- burn_ceiling              = (burn_4N_total / burn_N_total) / 4
- framework_share           = spark_efficiency / burn_ceiling
On a real cluster, N and 4N executor groups run on disjoint machines with
independent frequency/throughput budgets — the burn ceiling term is a
single-box artifact, so framework_share is the number that transfers.

Usage: python tools/scaling_with_control.py [n_pages] [rounds] [pairs...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")

from scaling_bench import run_level  # noqa: E402  (same-dir import)


def _burn(dur: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < dur:
        for _ in range(10000):
            x += 1
    return x


def burn_rate(n_procs: int, dur: float = 6.0) -> float:
    """Total M iterations/sec across n_procs busy processes."""
    with mp.Pool(n_procs) as pool:
        results = [pool.apply_async(_burn, (dur,)) for _ in range(n_procs)]
        total = sum(r.get() for r in results)
    return total / dur / 1e6


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pairs = [tuple(map(int, p.split(","))) for p in sys.argv[3:]] or [(8, 32)]

    levels = sorted({c for p in pairs for c in p})
    burn: dict[int, list[float]] = {c: [] for c in levels}
    spark: dict[int, list[float]] = {c: [] for c in levels}
    for _ in range(rounds):
        for c in levels:
            burn[c].append(burn_rate(c))
            spark[c].append(run_level(c, n_pages, 1)["docs_per_sec"])

    out = {
        "n_pages": n_pages,
        "levels": {
            str(c): {
                "burn_total_M_per_s": [round(b, 1) for b in burn[c]],
                "spark_docs_per_s": spark[c],
            }
            for c in levels
        },
        "pairs": {},
    }
    for lo, hi in pairs:
        s_eff = (max(spark[hi]) / max(spark[lo])) / (hi / lo)
        b_eff = (max(burn[hi]) / max(burn[lo])) / (hi / lo)
        out["pairs"][f"{lo}->{hi}"] = {
            "spark_efficiency": round(s_eff, 3),
            "burn_ceiling": round(b_eff, 3),
            "framework_share": round(s_eff / b_eff, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
