"""Host-artifact probe: WHY high-parallelism levels are fragile on this
sandbox (round-3 diagnosis of the 4→16 scaling-window swings).

Three pure-CPU controls, each at 4 and 16 processes on the same box:

- ``int``       — register-only integer loop (the classic burn control);
- ``copy``      — memcpy between two PREALLOCATED 64 MB buffers
                  (memory bandwidth, no kernel involvement);
- ``alloc``     — allocate a fresh 64 MB numpy buffer per iteration and
                  touch one byte per page (mmap + page-fault path).

Measured on this Firecracker guest (kernel 6.18.5-fc, idle, 2026-08-17):

    int    eff(4→16) ≈ 0.91   (cores are real and unthrottled at 16)
    copy   eff(4→16) ≈ 0.82   (bandwidth plateaus but does not collapse)
    alloc  eff(4→16) ≈ 0.36–0.54, with ABSOLUTE throughput ~450 allocs/s
           at 4 procs — three orders of magnitude below the arena-reuse
           rate (~150k/s with MALLOC_MMAP_THRESHOLD_=256MB, which keeps
           the buffer on the reusable heap instead of re-mmapping)

Conclusion recorded in BENCH.md: page-fault-heavy phases serialize in
the VMM on this box, so any workload that allocates large fresh buffers
(Arrow batch assembly, shuffle spill buffers) has a host-imposed
parallel-scaling ceiling that the int-burn control cannot see — and that
a real multi-machine cluster does not share (each node faults against
its own kernel). Raising MALLOC_MMAP_THRESHOLD_ for the Spark python
workers was tested and did NOT move job throughput (PyArrow allocates
through its own jemalloc/mimalloc pool, not glibc), ruling out the cheap
mitigation; the artifact is documented instead of tuned around.

Usage: python tools/alloc_fault_probe.py [dur_sec_per_sample]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

MB64 = 8 * 1024 * 1024  # int64 count -> 64 MB


def int_burn(dur: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < dur:
        for _ in range(10000):
            x += 1
    return x


def copy_burn(dur: float) -> int:
    a = np.ones(MB64, dtype=np.int64)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault both buffers in before timing
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        np.copyto(b, a)
        n += 1
    return n


def alloc_burn(dur: float) -> int:
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        a = np.empty(MB64, dtype=np.int64)
        a[::4096] = 1  # touch one byte per page
        n += 1
    return n


def rate(fn, procs: int, dur: float) -> float:
    # spawn: children re-read MALLOC_* env at process start, so the probe
    # honors externally-set thresholds (fork would inherit a glibc that
    # already chose its mmap threshold)
    ctx = mp.get_context("spawn")
    with ctx.Pool(procs) as pool:
        rs = [pool.apply_async(fn, (dur,)) for _ in range(procs)]
        return sum(r.get() for r in rs) / dur


def main() -> None:
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    for fn, name in ((int_burn, "int"), (copy_burn, "copy"),
                     (alloc_burn, "alloc")):
        r4 = rate(fn, 4, dur)
        r16 = rate(fn, 16, dur)
        print(
            f"{name:5s} 4procs={r4:12.1f}/s 16procs={r16:12.1f}/s "
            f"eff(4->16)={(r16 / r4) / 4:.3f}"
        )


if __name__ == "__main__":
    main()
