#!/usr/bin/env python
"""Isolated scaling probe for the data-proportional core of the index build:
tokenize -> enrich -> range shuffle -> sort -> grouping kernel -> write.

The full-build efficiency measurement (tools/scaling_bench.py) includes
fixed driver-side costs (docID sampling, stats stages, ~25 job schedulings,
codegen compilation, parquet commits) that are independent of corpus size —
at the sandbox's largest feasible corpus they are still a visible fraction
of wall-clock, while at 10^12 turns they vanish.  This probe times ONLY the
postings pipeline, the stage whose cost is proportional to data and which
therefore determines cluster-scale throughput.

Setup (outside timing): docs with assigned ids + doc_stats are materialized
to parquet once.  Timed region: read both -> tokenize -> join -> shuffle ->
sort -> kernel -> write postings.

Usage: python tools/postings_scaling_probe.py [--convs 20000] — runs
subprocesses pinned at 1 and 4 CPUs, prints both results + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cpus: int, prep_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.indexing.build import POSTINGS_SCHEMA, _postings_kernel
    from searchengine_spark.session import get_spark
    from searchengine_spark.text.spark_tokenize import tokenize

    spark = get_spark(f"postings_probe_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 4))
    docs = spark.read.parquet(os.path.join(prep_dir, "docs"))
    doc_stats = spark.read.parquet(os.path.join(prep_dir, "doc_stats"))
    avgdl = float(
        spark.read.parquet(os.path.join(prep_dir, "corpus_stats")).collect()[0]["avgdl"]
    )
    n_turns = docs.count()

    t0 = time.perf_counter()
    tokens = tokenize(docs.select("doc_id", "text"))
    enriched = (
        tokens.filter(F.col("term") != "")
        .join(doc_stats.select("doc_id", "doc_len", "l2_weight"), "doc_id")
        .repartitionByRange(max(cpus, 4), "term", "doc_id")
        .sortWithinPartitions("term", "doc_id", "position")
    )
    enriched.mapInPandas(_postings_kernel(avgdl), schema=POSTINGS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(out_dir)
    elapsed = time.perf_counter() - t0
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "postings_pipeline_s": round(elapsed, 2),
                "turns_per_sec": round(n_turns / elapsed, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    convs = 20000
    if "--convs" in sys.argv:
        convs = int(sys.argv[sys.argv.index("--convs") + 1])

    from searchengine_spark.data.transcripts import write_parquet
    from searchengine_spark.indexing.build import prepare_transcripts
    from searchengine_spark.indexing.logical import corpus_stats_table, doc_stats_table
    from searchengine_spark.session import get_spark

    parquet = f"/tmp/scaling_transcripts_{convs}.parquet"
    if not os.path.exists(parquet):
        write_parquet(parquet, convs, seed=42)

    prep_dir = f"/dev/shm/probe_prep_{convs}"
    if not os.path.exists(os.path.join(prep_dir, "corpus_stats", "_SUCCESS")):
        from pyspark.sql import functions as F

        spark = get_spark("probe_prep", cpus=8, shuffle_partitions=8)
        docs = prepare_transcripts(spark.read.parquet(parquet))
        docs.write.mode("overwrite").parquet(os.path.join(prep_dir, "docs"))
        docs = spark.read.parquet(os.path.join(prep_dir, "docs"))
        from searchengine_spark.text.spark_tokenize import tokenize

        tf = tokenize(docs.select("doc_id", "text")).groupBy("term", "doc_id").agg(
            F.count("*").alias("tf")
        )
        ds = doc_stats_table(tf)
        ds.write.mode("overwrite").parquet(os.path.join(prep_dir, "doc_stats"))
        corpus_stats_table(spark.read.parquet(os.path.join(prep_dir, "doc_stats"))).write.mode(
            "overwrite"
        ).parquet(os.path.join(prep_dir, "corpus_stats"))
        spark.stop()

    env = dict(os.environ)
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
    results = {}
    for cpus in (1, 4):
        out = subprocess.run(
            [
                "taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0",
                sys.executable, os.path.abspath(__file__),
                "--run-one", str(cpus), prep_dir, f"/dev/shm/probe_out_{cpus}",
            ],
            capture_output=True,
            text=True,
            timeout=3000,
            env=env,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(1)
        results[cpus] = json.loads(lines[0][len("RESULT "):])
        print(results[cpus], flush=True)
    eff = (results[4]["turns_per_sec"] / results[1]["turns_per_sec"]) / 4
    print(f"postings-pipeline scaling efficiency 1->4 cores: {eff:.3f}")


if __name__ == "__main__":
    main()
