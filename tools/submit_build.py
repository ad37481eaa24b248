#!/usr/bin/env python
"""spark-submit entry point for the index build (north rule: the pipeline
ships via ``spark-submit --py-files`` to a multi-executor cluster).

Cluster usage:
  python searchengine_spark/session.py             # or: make the zip below
  spark-submit --py-files /tmp/searchengine_spark_pkg.zip \\
      tools/submit_build.py --input <transcripts parquet/iceberg path> \\
      --output <index dir> [--partitions 2048] [--resume]

Local sandbox usage (no spark-submit needed — local master is inferred):
  python tools/submit_build.py --input /tmp/transcripts.parquet --output /tmp/idx

The script reads the transcript table (input_hint schema: conv_id, turn_idx,
role, text, tool, ts), assigns dense docIDs over (conv_id, turn_idx), runs
the build (tokenize -> stats -> sorted postings -> varbyte block-max
segments), and prints the manifest metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        required=True,
        help="transcripts parquet path, or iceberg:<catalog.db.table>",
    )
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--partitions", type=int, default=None, help="shuffle/range partitions")
    ap.add_argument("--resume", action="store_true", help="resume from checkpointed stages")
    ap.add_argument(
        "--snapshot-id",
        type=int,
        default=None,
        help="pin an Iceberg snapshot (resumable builds re-read the same immutable file set)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.build import build_index, prepare_transcripts
    from searchengine_spark.session import ensure_package_on_workers

    # under spark-submit the session comes from the submit conf; standalone
    # we fall back to the local factory
    active = SparkSession.getActiveSession()
    if active is None:
        from searchengine_spark.session import get_spark

        spark = get_spark("index_build")
    else:
        spark = active
        ensure_package_on_workers(spark)

    from searchengine_spark.sources.iceberg import read_transcripts

    transcripts = read_transcripts(spark, args.input, snapshot_id=args.snapshot_id)
    docs = prepare_transcripts(transcripts)
    manifest = build_index(spark, docs, args.output, n_partitions=args.partitions, resume=args.resume)
    print(json.dumps(manifest["metrics"], indent=2))


if __name__ == "__main__":
    main()
