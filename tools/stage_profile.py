#!/usr/bin/env python
"""Per-stage decomposition of one index build via the Spark UI REST API.

The scaling protocol (tools/scaling_bench.py) shows local[8] builds are
rock-steady (~±3%) while local[32] builds swing 2.5x run-to-run on this
host.  Wall-clock alone cannot attribute that: this tool runs ONE build at
a given parallelism with the UI enabled and scrapes per-stage executor run
time, CPU time, GC time, shuffle read/write bytes, and spill — the numbers
that separate "the hypervisor stole cycles" (run time >> CPU time, GC
inflated) from "the engine shuffled/spilled more" (bytes differ).

Usage:
  python tools/stage_profile.py CPUS PARQUET [OUTDIR]
Prints one JSON line per stage (sorted by executorRunTime desc) plus a
summary line; exits with the build wall-clock in the summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    parquet = sys.argv[2]
    outdir = sys.argv[3] if len(sys.argv) > 3 else f"/dev/shm/profile_idx{cpus}"

    os.environ["SPARK_GRAFT_UI"] = "1"
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)

    from searchengine_spark.indexing.build import build_index, prepare_transcripts
    from searchengine_spark.session import get_spark

    spark = get_spark(f"stage_profile_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    ui = spark.sparkContext.uiWebUrl
    transcripts = spark.read.parquet(parquet)
    n_turns = transcripts.count()

    t0 = time.perf_counter()
    docs = prepare_transcripts(transcripts)
    build_index(spark, docs, outdir)
    build_s = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = json.load(r)
    stage_phase: dict[int, str] = {}
    for j in jobs:
        desc = j.get("description") or j.get("name", "")
        for sid in j.get("stageIds", []):
            stage_phase[sid] = desc.split(" at ")[0][:60]

    rows = []
    for s in stages:
        if s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "phase": stage_phase.get(s["stageId"], "?"),
                "name": s["name"].split("\n")[0][:40],
                "tasks": s.get("numCompleteTasks"),
                "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            }
        )
    rows.sort(key=lambda x: -x["run_s"])
    for row in rows:
        print(json.dumps(row), flush=True)
    tot = {
        "cpus": cpus,
        "n_turns": n_turns,
        "build_s": round(build_s, 1),
        "sum_run_s": round(sum(r["run_s"] for r in rows), 1),
        "sum_cpu_s": round(sum(r["cpu_s"] for r in rows), 1),
        "sum_gc_s": round(sum(r["gc_s"] for r in rows), 1),
        "sum_shuf_write_mb": round(sum(r["shuf_write_mb"] for r in rows), 1),
        "sum_spill_disk_mb": round(sum(r["spill_disk_mb"] for r in rows), 1),
    }
    print("SUMMARY " + json.dumps(tot), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
