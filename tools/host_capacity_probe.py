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


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    best8 = max(run(8) for _ in range(reps))
    best32 = max(run(32) for _ in range(reps))
    eff = (best32 / best8) / 4
    print(
        json.dumps(
            {
                "tp_8": round(best8, 3),
                "tp_32": round(best32, 3),
                "host_ceiling_efficiency_8_to_32": round(eff, 3),
                "effective_cores_at_32": round(best32 / best8 * 8, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
