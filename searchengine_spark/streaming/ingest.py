"""Incremental index ingest via Structured Streaming (Spark-first extension).

The reference is batch-only (its closest concept is the GUI progress callback,
spimi.py:96-98), but a 10^12-turn corpus is never static, so the engine
supports Lucene-style *segment deltas*:

  readStream(transcripts) -> foreachBatch:
      assign doc_ids (dense, continuing from the running high-water mark)
      tokenize -> per-batch postings delta  (term, doc_id, tf, positions)
      append delta parquet + doc_stats delta + epoch manifest entry
  compact():
      merge main postings + all deltas, recompute corpus stats / weights /
      block-max segments / term_stats -> a standard SparkIndex directory

Deltas deliberately carry RAW tf/positions, not scoring weights: wdt depends
on avgdl, a corpus-global statistic that drifts as turns arrive — weights are
finalized at compaction, exactly as the batch build computes them after
corpus_stats.  Exactly-once: the streaming checkpoint dedupes source files,
and each epoch writes to its own delta path recorded in the manifest (an
epoch retried by the sink overwrites its own directory — idempotent).

DocID contract under streaming: dense in *arrival order* (epoch order, then
(conv_id, turn_idx) within the batch).  This extends the reference's
"assignment order" contract (directorycorpus.py:64-79) to unbounded input;
when files arrive in corpus order the ids coincide with the batch build
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data.transcripts import spark_schema
from ..indexing.build import IndexBuilder, assign_doc_ids


class StreamingIndexer:
    def __init__(self, spark: SparkSession, index_dir: str, n_partitions: int | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.n_partitions = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.deltas_dir = os.path.join(index_dir, "deltas")
        self.manifest_path = os.path.join(index_dir, "stream_manifest.json")

    # -- manifest ----------------------------------------------------------
    def _manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"next_doc_id": 0, "epochs": {}}

    def _save(self, m: dict) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self.manifest_path)

    # -- micro-batch sink --------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — also callable directly (tests / backfills).
        Pinned build shuffle config: an ingest-plus-serve session has AQE
        coalescing flipped on by SparkIndex.warm(), which must not squeeze
        the epoch's token shuffle (see pinned_build_conf)."""
        from ..indexing.build import pinned_build_conf
        from ..text.spark_tokenize import tokenize

        with pinned_build_conf(self.spark):
            return self._process_batch_inner(batch_df, epoch_id, tokenize)

    def _process_batch_inner(self, batch_df: DataFrame, epoch_id: int, tokenize) -> None:
        m = self._manifest()
        if str(epoch_id) in m["epochs"]:
            return  # retried epoch: already durable (idempotent sink)
        base = m["next_doc_id"]

        assigned = assign_doc_ids(batch_df, n_partitions=self.n_partitions)
        docs = assigned.withColumn("doc_id", F.col("doc_id") + F.lit(base)).withColumn(
            "title", F.concat_ws(":", "conv_id", "turn_idx")
        ).persist()
        docs._docid_cache = assigned._docid_cache

        tokens = tokenize(docs, text_col="text", id_col="doc_id").persist()

        epoch_dir = os.path.join(self.deltas_dir, f"epoch={epoch_id}")
        # raw postings delta (no weights yet — see module docstring); same
        # sorted-partition numpy kernel as the batch build instead of a
        # collect_list object aggregation (ObjectHashAggregate is GC-bound
        # and falls back to sort-based — the batch build measured it 3-6x
        # slower than the kernel)
        from ..indexing.build import RAW_POSTINGS_SCHEMA, _postings_kernel

        tf_pos = (
            tokens.filter(F.col("term") != "")
            .select("term", "doc_id", "position")
            .repartitionByRange(self.n_partitions, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id", "position")
            .mapInPandas(_postings_kernel(None), schema=RAW_POSTINGS_SCHEMA)
        )
        tf_pos.write.mode("overwrite").parquet(os.path.join(epoch_dir, "postings_raw"))

        # doc stats delta (empty terms count toward doc_len/L_d, spimi.py:74-93)
        doc_stats = (
            tokens.groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"))
            .groupBy("doc_id")
            .agg(
                F.sum("tf").alias("doc_len"),
                F.sqrt(F.sum(F.pow(F.lit(1.0) + F.log("tf"), 2))).alias("l2_weight"),
            )
        )
        meta_cols = [c for c in ("title", "conv_id", "turn_idx", "role", "tool") if c in docs.columns]
        full_stats = docs.select("doc_id", *meta_cols).join(doc_stats, "doc_id", "left").fillna(
            {"doc_len": 0}
        )
        full_stats.write.mode("overwrite").parquet(os.path.join(epoch_dir, "doc_stats"))

        n_new = docs.count()
        m["epochs"][str(epoch_id)] = {
            "base_doc_id": base,
            "n_docs": n_new,
            "completed_at": time.time(),
        }
        m["next_doc_id"] = base + n_new
        self._save(m)
        tokens.unpersist()
        docs.unpersist()
        from ..indexing.build import _DOCID_CACHES, release_docid_cache_of, release_docid_caches

        # same policy as IndexBuilder.build: scoped release, falling back to
        # the drain only in the unambiguous single-cache case
        if not release_docid_cache_of(docs) and len(_DOCID_CACHES) == 1:
            release_docid_caches()

    # -- driver ------------------------------------------------------------
    def start(self, source_path: str, checkpoint_dir: str, available_now: bool = True):
        """Stream transcript parquet files from source_path; availableNow
        drains everything currently present then stops (the backfill mode);
        set False for a continuous run."""
        stream = (
            self.spark.readStream.schema(spark_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(source_path)
        )
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- compaction --------------------------------------------------------
    def compact(self) -> dict:
        """Merge all deltas into a standard batch index layout (postings with
        finalized weights, block-max segments, term/doc/corpus stats) under
        index_dir.  Reuses the batch IndexBuilder stages from the raw-delta
        representation.  Pinned build shuffle config (see pinned_build_conf)."""
        from ..indexing.build import pinned_build_conf

        with pinned_build_conf(self.spark):
            return self._compact_inner()

    def _compact_inner(self) -> dict:
        from ..indexing.logical import corpus_stats_table
        from ..indexing.segments import encode_segments

        spark = self.spark
        m = self._manifest()
        if not m["epochs"]:
            raise ValueError("no epochs ingested")

        # read ONLY manifest-committed epochs: a partially-written epoch dir
        # whose manifest entry was never recorded (crash between the parquet
        # writes and _save) must not leak docs past the doc_id watermark
        epoch_dirs = [
            os.path.join(self.deltas_dir, f"epoch={eid}") for eid in sorted(m["epochs"], key=int)
        ]
        doc_stats = spark.read.parquet(*[os.path.join(d, "doc_stats") for d in epoch_dirs])
        doc_stats.write.mode("overwrite").parquet(os.path.join(self.index_dir, "doc_stats"))
        doc_stats = spark.read.parquet(os.path.join(self.index_dir, "doc_stats"))

        corpus = corpus_stats_table(doc_stats)
        corpus.write.mode("overwrite").parquet(os.path.join(self.index_dir, "corpus_stats"))
        row = spark.read.parquet(os.path.join(self.index_dir, "corpus_stats")).collect()[0]
        avgdl = float(row["avgdl"])

        raw = spark.read.parquet(*[os.path.join(d, "postings_raw") for d in epoch_dirs])
        weighted = (
            raw.join(doc_stats.select("doc_id", "doc_len", "l2_weight"), "doc_id")
            .withColumn(
                "wdt_bm25",
                (F.lit(2.2) * F.col("tf"))
                / (F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("doc_len") / F.lit(avgdl))) + F.col("tf")),
            )
            .withColumn("wdt_tfidf_norm", (F.lit(1.0) + F.log("tf")) / F.col("l2_weight"))
            .drop("doc_len", "l2_weight")
            .repartitionByRange(self.n_partitions, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id")
        )
        weighted.write.mode("overwrite").parquet(os.path.join(self.index_dir, "postings"))
        postings = spark.read.parquet(os.path.join(self.index_dir, "postings"))

        seg_input = postings.repartitionByRange(self.n_partitions, "term", "doc_id").sortWithinPartitions(
            "term", "doc_id"
        )
        encode_segments(seg_input).write.mode("overwrite").parquet(
            os.path.join(self.index_dir, "segments")
        )
        from ..indexing.build import term_stats_with_block_meta

        term_stats_with_block_meta(
            postings, spark.read.parquet(os.path.join(self.index_dir, "segments"))
        ).write.mode("overwrite").parquet(os.path.join(self.index_dir, "term_stats"))
        # standard manifest so SparkIndex tooling sees a complete build
        builder = IndexBuilder(spark, self.index_dir, self.n_partitions)
        builder._load_manifest()
        for stage in ("doc_stats", "corpus_stats", "postings", "segments", "term_stats"):
            builder._mark_stage(stage)
        builder.manifest["metrics"] = {
            "n_docs": int(row["n_docs"]),
            "total_tokens": int(row["total_tokens"]),
            "n_postings": postings.count(),
            "avgdl": avgdl,
            "n_epochs": len(m["epochs"]),
        }
        builder._save_manifest()
        return builder.manifest
