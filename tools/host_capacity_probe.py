#!/usr/bin/env python
"""Host capacity ceiling for the N->4N scaling measurement.

Runs IDENTICAL fixed CPU work (2M md5 digests per process) as 8 and as 32
concurrent pinned Python processes — no Spark, no JVM, no shuffle, no I/O.
Throughput = work quanta completed per wall-clock second; efficiency =
(tp_32 / tp_8) / 4.

If plain embarrassingly-parallel CPU work cannot scale 8->32 at >= 0.8 on
this host, no distributed engine can: the ratio printed here is the
hardware ceiling against which the engine's own scaling efficiency
(tools/scaling_bench.py) must be judged.  On this sandbox the 32 vCPUs are
oversubscribed/SMT-shared, and this probe measures ~0.68 — i.e. 32 vCPUs
deliver ~2.7x the cycles of 8 vCPUs, not 4x.

Usage: python tools/host_capacity_probe.py [--reps 3]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORK = """
import hashlib
for i in range(2_000_000):
    hashlib.md5(b"x%d" % i).digest()
"""


def run(nproc: int) -> float:
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"0-{nproc - 1}", sys.executable, "-c", WORK],
        )
        for _ in range(nproc)
    ]
    for p in procs:
        p.wait()
    wall = time.perf_counter() - t0
    return nproc / wall  # quanta per second


def _levels() -> tuple[int, int]:
    """Width pair under test (default 8,32); --levels N,XN probes the same
    pair the scaling protocol uses — cores 0-7 of this VM behave differently
    from 8-31, so a ceiling is only meaningful at the protocol's own
    widths."""
    if "--levels" in sys.argv:
        a, b = sys.argv[sys.argv.index("--levels") + 1].split(",")
        return int(a), int(b)
    return 8, 32


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    n, xn = _levels()
    best_n = max(run(n) for _ in range(reps))
    best_xn = max(run(xn) for _ in range(reps))
    eff = (best_xn / best_n) / (xn / n)
    print(
        json.dumps(
            {
                f"tp_{n}": round(best_n, 3),
                f"tp_{xn}": round(best_xn, 3),
                f"host_ceiling_efficiency_{n}_to_{xn}": round(eff, 3),
                f"effective_cores_at_{xn}": round(best_xn / best_n * n, 1),
            }
        )
    )


BW_WORK = """
import numpy as np
a = np.zeros(64 * 1024 * 1024, dtype=np.int64)  # 512 MB, far beyond LLC
s = 0
for _ in range(8):
    a += 1          # streaming read-modify-write over 512 MB
    s += int(a[0])
"""


def run_bw(nproc: int) -> float:
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"0-{nproc - 1}", sys.executable, "-c", BW_WORK],
        )
        for _ in range(nproc)
    ]
    for p in procs:
        p.wait()
    return nproc / (time.perf_counter() - t0)


def main_bw() -> None:
    """Memory-BANDWIDTH ceiling (--bw): the md5 probe is cache-resident and
    measures deliverable CPU cycles, but a shuffle/sort/cache-heavy engine
    streams GBs through DRAM — if the VM's memory controllers saturate
    below 32 cores' demand, data-proportional stages stop scaling long
    before the compute ceiling predicts.  Identical fixed streaming work
    (8 passes of += over a 512 MB array, ~32 GB of read+write traffic per
    process) as 8 vs 32 concurrent pinned processes."""
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    n, xn = _levels()
    best_n = max(run_bw(n) for _ in range(reps))
    best_xn = max(run_bw(xn) for _ in range(reps))
    eff = (best_xn / best_n) / (xn / n)
    print(
        json.dumps(
            {
                f"bw_tp_{n}": round(best_n, 3),
                f"bw_tp_{xn}": round(best_xn, 3),
                f"bandwidth_ceiling_efficiency_{n}_to_{xn}": round(eff, 3),
                f"effective_streaming_cores_at_{xn}": round(best_xn / best_n * n, 1),
            }
        )
    )


if __name__ == "__main__":
    if "--bw" in sys.argv:
        main_bw()
    else:
        main()
