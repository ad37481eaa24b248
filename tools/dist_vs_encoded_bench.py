"""Dist-vs-encoded build comparison (round-5 done-criterion for the
distributed dictionary path).

Builds the same pre-generated transcript corpus twice per rep under a
pinned core budget — once on the in-memory encoded path (the default below
the cutoffs) and once on the DISTRIBUTED dictionary path (forced by
dropping BROADCAST_WEIGHTS_MAX_DOCS via env, exactly how a >4M-doc corpus
would route) — interleaved so host weather hits both alike.  Reports build
seconds, turns/sec, per-phase breakdown, and the dist/encoded ratio; the
target from the round-4 verdict is ratio <= ~1.2.

Usage:
  python tools/dist_vs_encoded_bench.py [--convs 240000] [--cpus 8] [--reps 2]
  python tools/dist_vs_encoded_bench.py --run-one <enc|dist> <cpus> <parquet> <outdir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(mode: str, cpus: int, parquet: str, outdir: str) -> None:
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    from searchengine_spark.session import get_spark

    spark = get_spark(f"dve_{mode}_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "dist":
        import searchengine_spark.indexing.build as bmod

        # route exactly as a >4M-doc corpus would: over the doc cutoff
        bmod.BROADCAST_WEIGHTS_MAX_DOCS = 1000

    from searchengine_spark.indexing.build import build_index, prepare_transcripts

    transcripts = spark.read.parquet(parquet)
    n_turns = transcripts.count()
    t0 = time.perf_counter()
    docs = prepare_transcripts(transcripts)
    manifest = build_index(spark, docs, outdir)
    build_s = time.perf_counter() - t0
    path_marker = (
        "dist" if "dict_assign" in manifest["metrics"]["phase_seconds"]
        else ("encoded" if "vocab_collect" in manifest["metrics"]["phase_seconds"] else "string")
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "mode": mode,
                "path_taken": path_marker,
                "cpus": cpus,
                "n_turns": n_turns,
                "build_s": round(build_s, 2),
                "turns_per_sec": round(n_turns / build_s, 1),
                "n_postings": manifest["metrics"]["n_postings"],
                "phases": manifest["metrics"]["phase_seconds"],
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return

    convs, cpus, reps = 240_000, 8, 2
    args = sys.argv[1:]
    if "--convs" in args:
        convs = int(args[args.index("--convs") + 1])
    if "--cpus" in args:
        cpus = int(args[args.index("--cpus") + 1])
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    from searchengine_spark.data.transcripts import write_parquet

    parquet = f"/tmp/scaling_transcripts_{convs}.parquet"
    if not os.path.exists(parquet):
        n = write_parquet(parquet, convs, seed=42)
        print(f"generated {n} turns -> {parquet}", flush=True)

    results = []
    for rep in range(reps):
        for mode in ("enc", "dist"):
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}", sys.executable, __file__,
                "--run-one", mode, str(cpus), parquet, f"/tmp/dve_{mode}_idx",
            ]
            out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(f"rep {rep} {mode} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
                sys.exit(1)
            r = json.loads(line[-1][len("RESULT "):])
            r["rep"] = rep
            results.append(r)
            print(f"rep {rep} {mode}: {r['build_s']}s ({r['turns_per_sec']} t/s), path={r['path_taken']}")

    enc = [r for r in results if r["mode"] == "enc"]
    dist = [r for r in results if r["mode"] == "dist"]
    best_enc = min(r["build_s"] for r in enc)
    best_dist = min(r["build_s"] for r in dist)
    ratio = best_dist / best_enc
    summary = {
        "convs": convs,
        "n_turns": enc[0]["n_turns"],
        "cpus": cpus,
        "best_enc_s": best_enc,
        "best_dist_s": best_dist,
        "dist_over_enc_ratio": round(ratio, 3),
        "target": "<= ~1.2",
        "results": results,
    }
    print("SUMMARY " + json.dumps(summary))
    # keyed by (convs, cpus) so campaigns at different scales/widths coexist
    out_name = f"DIST_VS_ENCODED_r5_c{convs}_w{cpus}.json"
    with open(os.path.join(REPO, "evidence", out_name), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
