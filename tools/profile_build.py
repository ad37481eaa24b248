#!/usr/bin/env python
"""Phase-decomposed build profile at one pinned parallelism level.

Runs ONE full index build in a taskset-pinned subprocess and prints a
RESULT JSON line with wall-clock, throughput, process CPU seconds, and the
per-phase wall times the build manifest records (vocab_collect,
stats_collect, postings, segments, term_stats, ...).  Comparing two levels
(e.g. 1 and 4) attributes scaling loss to specific phases — this is the
tool that located the segments-phase bandwidth wall.

Usage:
  python tools/profile_build.py CPUS [PARQUET]           # one pinned run
  python tools/profile_build.py --pair 1,4 [PARQUET]     # both + efficiency
PARQUET defaults to the 120k-conv (~900k-turn) scaling corpus, generated
on first use.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CONVS = 120_000


def _ensure_corpus(parquet: str | None) -> str:
    if parquet:
        return parquet
    path = f"/tmp/scaling_transcripts_{DEFAULT_CONVS}.parquet"
    if not os.path.exists(path):
        from searchengine_spark.data.transcripts import write_parquet

        n = write_parquet(path, DEFAULT_CONVS, seed=42)
        print(f"generated {n} turns -> {path}", flush=True)
    return path


def run_one(cpus: int, parquet: str) -> None:
    from searchengine_spark.indexing.build import build_index, prepare_transcripts
    from searchengine_spark.session import get_spark

    def _tree_cpu_seconds() -> float:
        """utime+stime of this process and every live descendant (the JVM
        and Python workers are unreaped children, invisible to
        RUSAGE_CHILDREN while alive)."""
        hz = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        children: dict[int, list[int]] = {}
        ticks: dict[int, int] = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as fh:
                    parts = fh.read().rsplit(")", 1)[1].split()
            except OSError:
                continue
            ppid = int(parts[1])
            ticks[int(pid_s)] = int(parts[11]) + int(parts[12])
            children.setdefault(ppid, []).append(int(pid_s))
        total, stack = 0, [me]
        while stack:
            pid = stack.pop()
            total += ticks.get(pid, 0)
            stack.extend(children.get(pid, []))
        return total / hz

    outdir = f"/dev/shm/profile_build_{cpus}"
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    spark = get_spark(f"profile_build_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    transcripts = spark.read.parquet(parquet)
    n_turns = transcripts.count()

    t0 = time.perf_counter()
    ta = time.perf_counter()
    docs = prepare_transcripts(transcripts)
    docs.count()  # materialize the docID cache so assign time is separable
    assign_s = time.perf_counter() - ta
    cpu_before = _tree_cpu_seconds()
    manifest = build_index(spark, docs, outdir)
    build_s = time.perf_counter() - t0
    cpu_s = _tree_cpu_seconds() - cpu_before
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "build_s": round(build_s, 2),
                "turns_per_sec": round(n_turns / build_s, 1),
                "assign_doc_ids_s": round(assign_s, 2),
                "cpu_seconds": round(cpu_s, 1),
                "cpu_per_wall": round(cpu_s / build_s, 2),
                "phases": {
                    k: round(v, 3)
                    for k, v in manifest["metrics"].get("phase_seconds", {}).items()
                },
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]), sys.argv[3])
        return

    if sys.argv[1] == "--pair":
        levels = [int(x) for x in sys.argv[2].split(",")]
        parquet = _ensure_corpus(sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        levels = [int(sys.argv[1])]
        parquet = _ensure_corpus(sys.argv[2] if len(sys.argv) > 2 else None)

    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    results = {}
    for cpus in levels:
        mask = f"0-{cpus - 1}" if cpus > 1 else "0"
        out = subprocess.run(
            ["taskset", "-c", mask, sys.executable, os.path.abspath(__file__),
             "--run-one", str(cpus), parquet],
            capture_output=True, text=True, timeout=5400, env=env,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(1)
        results[cpus] = json.loads(lines[0][len("RESULT "):])
        print("RESULT " + json.dumps(results[cpus]), flush=True)
    if len(levels) == 2:
        a, b = levels
        eff = (results[b]["turns_per_sec"] / results[a]["turns_per_sec"]) / (b / a)
        print(f"scaling efficiency {a}->{b} cores: {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
