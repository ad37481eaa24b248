"""Distributed inverted-index build (SURVEY.md §2 B1-B7, §7 Phase 2).

Replaces the reference's SPIMI block/merge machinery
(reference: engine/indexing/spimi.py:56-298) with Spark's shuffle: the
repartition-by-range + sort-within-partitions *is* the blocked sort + k-way
merge, with spill handled by the engine.  Hot-term skew is defused by range
partitioning on the composite key (term, doc_id) — a stopword's postings
spread across many partitions instead of hot-spotting one (the same effect as
salting, chosen because it additionally yields globally term-sorted output
for parquet min/max pruning).

Artifacts (all parquet, under one index directory):
  postings/      term, doc_id, tf, positions, wdt_bm25, wdt_tfidf_norm
                 — range-partitioned and sorted by (term, doc_id) so term
                 filters prune row groups; scoring weights are precomputed at
                 build time so the query hot path never joins doc_stats
                 (the reference recomputes wdt per posting per query,
                 rankedquery.py:18-25 — its slow path)
  doc_stats/     doc_id, title, doc_len, l2_weight (+ carried metadata cols)
  term_stats/    term, df, cf, max_wdt_bm25 (broadcast at query time; plays
                 the SQLite dictionary's role, spimi.py:25-29)
  corpus_stats/  n_docs, total_tokens, avgdl (1 row)
  manifest.json  per-stage lineage + build metrics (postings/sec, skew ratio)

Resumability: each artifact write is idempotent and the manifest records
completed stages; ``build_index(..., resume=True)`` skips stages whose
artifact + manifest entry already exist.
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..text.spark_tokenize import tokenize
from .logical import (
    BM25_B,
    BM25_K1,
    corpus_stats_table,
    doc_stats_table,
    term_stats_table,
)

META_COLS = ("conv_id", "turn_idx", "role", "tool")

POSTINGS_SCHEMA = (
    "term string, doc_id long, tf long, positions array<long>, "
    "wdt_bm25 double, wdt_tfidf_norm double"
)

RAW_POSTINGS_SCHEMA = "term string, doc_id long, tf long, positions array<long>"


def _postings_kernel(avgdl: float | None, weights_bc=None):
    """Vectorized grouping kernel: input partitions sorted by
    (term, doc_id, position); output one row per (term, doc_id) with tf,
    the position list, and the precomputed K3/K4 document weights
    (rankedquery.py:22,24 — wdt_bm25 with k1=1.2, b=0.75 so 2.2 = k1+1 and
    0.25 = 1-b).  All numpy.

    ``weights_bc``: optional ``sc.broadcast`` of dense ``(doc_len, l2)``
    float64 arrays indexed by doc_id (doc_ids are dense by construction).
    When set, the kernel looks doc weights up locally instead of reading
    ``doc_len``/``l2_weight`` columns off its input rows — which means the
    range shuffle feeding this kernel carries 16 fewer bytes per token
    occurrence.  That matters because the shuffle+sort is the build's
    dominant data movement AND is memory-bandwidth-bound at high
    parallelism (tools/host_capacity_probe.py --bw: this host streams at
    ~0.43 scaling efficiency 8->32 vs 0.68-0.71 for compute), so shuffled
    bytes convert directly into scaling headroom.  Only offered below
    BROADCAST_WEIGHTS_MAX_DOCS; beyond that the per-row carry (pre-join)
    is the correct plan and ``weights_bc`` stays None.

    ``avgdl=None`` yields the RAW form (term, doc_id, tf, positions) with
    no weight columns and no doc_len/l2 inputs — the streaming delta shape,
    where weights are deferred to compaction because avgdl drifts.

    Memory: Arrow batches are processed as they STREAM — each batch emits
    every complete (term, doc_id) group and carries only the trailing
    incomplete group into the next batch, so peak per-partition memory is
    O(batch + largest single group), not O(partition) (a whole-partition
    concat would OOM on large or skewed partitions at 10^12-posting
    scale)."""

    def process(pdf):
        import numpy as np
        import pandas as pd

        term = pdf["term"].to_numpy()
        doc = pdf["doc_id"].to_numpy(dtype=np.int64)
        pos = pdf["position"].to_numpy(dtype=np.int64)
        n = len(pdf)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (term[1:] != term[:-1]) | (doc[1:] != doc[:-1])
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, n)).astype(np.int64)
        out = {
            "term": term[starts],
            "doc_id": doc[starts],
            "tf": tf,
            "positions": np.split(pos, starts[1:]),
        }
        if avgdl is not None:
            if weights_bc is not None:
                dl_arr, l2_arr = weights_bc.value
                group_docs = doc[starts]
                dl = dl_arr[group_docs]
                l2_group = l2_arr[group_docs]
            else:
                dl = pdf["doc_len"].to_numpy(dtype=np.float64)[starts]
                l2_group = pdf["l2_weight"].to_numpy(dtype=np.float64)[starts]
            tf_f = tf.astype(np.float64)
            out["wdt_bm25"] = ((BM25_K1 + 1.0) * tf_f) / (
                BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl)) + tf_f
            )
            out["wdt_tfidf_norm"] = (1.0 + np.log(tf_f)) / l2_group
        return pd.DataFrame(out)

    def fn(iterator):
        import pandas as pd

        carry = None
        for pdf in iterator:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            # the last (term, doc_id) group may continue in the next batch:
            # hold it back
            last_term = pdf["term"].iloc[-1]
            last_doc = pdf["doc_id"].iloc[-1]
            tail_mask = (pdf["term"] == last_term) & (pdf["doc_id"] == last_doc)
            split_at = len(pdf) - int(tail_mask.iloc[::-1].cummin().sum())
            carry = pdf.iloc[split_at:].reset_index(drop=True)
            if split_at:
                yield process(pdf.iloc[:split_at])
        if carry is not None and len(carry):
            yield process(carry)

    return fn


@contextlib.contextmanager
def pinned_build_conf(spark: SparkSession):
    """Pin BUILD shuffle config for the duration of a build/compaction and
    restore the session's previous values after.

    The build's shuffles (token-stream aggregations, the range shuffle) are
    CPU-heavy relative to their bytes, so AQE's byte-based partition
    coalescing would squeeze them onto a handful of tasks and serialize the
    build.  Serving wants the opposite (SparkIndex.warm() turns coalescing
    ON so tiny per-query reduce stages do not run at build width), and one
    session may interleave both — streaming ingest plus queries — so each
    phase pins its own sizing instead of fighting over the session default."""
    keys = ("spark.sql.adaptive.coalescePartitions.enabled",)
    prev = {}
    for k in keys:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
    spark.conf.set(keys[0], "false")
    try:
        yield
    finally:
        for k in keys:
            if prev[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev[k])


_DOCID_CACHES: list[DataFrame] = []


def release_docid_caches() -> None:
    """Unpersist every ranged corpus cached by assign_doc_ids — a global
    drain for sessions with one producer at a time.  Builders that received
    a frame carrying its own ``_docid_cache`` handle release just that one
    (release_docid_cache_of), so concurrent builders on one session do not
    evict each other's in-flight caches."""
    while _DOCID_CACHES:
        _DOCID_CACHES.pop().unpersist()


def release_docid_cache_of(df: DataFrame) -> bool:
    """Release only the cache backing this assign_doc_ids output (the
    handle is propagated on the returned DataFrame).  Returns True when a
    handle was found and released."""
    cache = getattr(df, "_docid_cache", None)
    if cache is None:
        return False
    cache.unpersist()
    try:
        _DOCID_CACHES.remove(cache)
    except ValueError:
        pass
    return True


def assign_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    n_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based doc_id over ORDER BY order_cols — the reference's
    sequential docID contract (directorycorpus.py:64-79) — without a global
    single-partition window.

    Scale path: range-partition + sort, count rows per partition (tiny
    driver-side collect of one long per partition), then enumerate each
    (already sorted) partition in a zero-shuffle Arrow pass:
    doc_id = partition_offset + running row index.

    The counting pass materializes the ranged cache, so the enumeration and
    every downstream consumer read cached partitions; the handle is
    registered for release_docid_caches() (called by build/compact/streaming
    once their outputs are durable).  At 10^12-turn scale the equivalent is
    writing the ranged pass to storage once instead of caching.

    An earlier shape used Window.partitionBy(_pid).orderBy(order_cols) +
    a broadcast offsets join: the window's required HashPartitioning(_pid)
    does not match the range layout, so Spark inserted a SECOND full-corpus
    shuffle plus a sort the data already satisfied — measured ~2x the
    enumeration cost of this narrow pass at every parallelism level, pure
    fixed cost at the bottom of every build/ingest.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _DOCID_CACHES.append(ranged)
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    in_cols = [c for c in ranged.columns if c != "_pid"]
    out_schema = T.StructType(
        [ranged.schema[c] for c in in_cols] + [T.StructField("doc_id", T.LongType())]
    )

    def enumerate_partition(iterator):
        import numpy as np

        # Arrow batches stream in partition row order (the partitions are
        # sorted by order_cols), so a running counter + the partition's
        # precomputed offset reproduces the global row_number exactly
        seen = 0
        offset = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if offset is None:
                offset = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[in_cols].copy()
            out["doc_id"] = np.arange(offset + seen, offset + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield out

    out = ranged.mapInPandas(enumerate_partition, schema=out_schema)
    out._docid_cache = ranged  # scoped-release handle (release_docid_cache_of)
    out._n_docs = acc  # corpus size, already paid for by the counting pass —
    # lets the builder size its shuffles by data before any build action runs
    return out


def term_stats_with_block_meta(postings_df: DataFrame, segments_df: DataFrame) -> DataFrame:
    """B7 dictionary + per-term block-max tops (top-32 block maxima, min
    block max, block count, per scoring mode).  WAND's metadata theta and
    its prune-or-fall-through decision then come from the dictionary collect
    the ranked path already pays — zero extra jobs (querying/wand.py)."""
    seg_meta = (
        segments_df.select("term", "max_wdt_bm25", "max_wdt_tfidf_norm")
        .groupBy("term")
        .agg(
            F.slice(F.sort_array(F.collect_list("max_wdt_bm25"), asc=False), 1, 32).alias(
                "top_block_max_bm25"
            ),
            F.min("max_wdt_bm25").alias("min_block_max_bm25"),
            F.slice(
                F.sort_array(F.collect_list("max_wdt_tfidf_norm"), asc=False), 1, 32
            ).alias("top_block_max_tfidf_norm"),
            F.min("max_wdt_tfidf_norm").alias("min_block_max_tfidf_norm"),
            F.count("*").alias("n_blocks"),
        )
    )
    return term_stats_table(postings_df).join(seg_meta, "term", "left")


BROADCAST_WEIGHTS_MAX_DOCS = 4_000_000  # ~100 MB of (doc_id, doc_len, l2)
# One postings reduce partition ≈ this many docs (~2M token rows, a
# ~100-200 MB sorted working set).  The range-shuffle partition count is
# max(session shuffle partitions, ceil(n_docs / this)) — see _build.
DOCS_PER_POSTINGS_PARTITION = 60_000


def doc_weight_arrays(doc_stats: DataFrame, n_docs: int):
    """Dense (doc_len, l2_weight) float64 arrays indexed by doc_id, for the
    kernel-side broadcast lookup (see _postings_kernel weights_bc).  doc_ids
    are dense 0..n-1 by construction (assign_doc_ids), so plain array
    indexing replaces the enrichment join.  16 bytes/doc: 64 MB at the
    4M-doc cutoff, collected once from the already-cached doc_stats.

    Returns ``None`` when the density contract does not hold (ids outside
    [0, n_docs) — e.g. a filtered/sparse-id corpus fed straight to
    IndexBuilder.build without re-running assign_doc_ids): the caller then
    falls back to the per-row enrichment join, which is id-agnostic.
    Without this guard a negative id would silently index from the array
    end and produce wrong BM25/tf-idf weights."""
    import numpy as np

    pdf = doc_stats.select("doc_id", "doc_len", "l2_weight").toPandas()
    dl = np.zeros(n_docs, dtype=np.float64)
    l2 = np.ones(n_docs, dtype=np.float64)
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() >= n_docs):
        return None
    dl[ids] = pdf["doc_len"].to_numpy(dtype=np.float64)
    # l2_weight is null for empty docs; they emit no tokens, so the slot is
    # never read — nan_to_num only keeps the array finite for transport
    l2[ids] = np.nan_to_num(pdf["l2_weight"].to_numpy(dtype=np.float64), nan=1.0)
    return dl, l2


def enriched_tokens(
    tokens: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    n_partitions: int,
    carry_weights: bool | None = None,
) -> DataFrame:
    """Token stream range-partitioned and sorted for the postings kernel —
    the build's dominant data movement.

    Below BROADCAST_WEIGHTS_MAX_DOCS the stream carries ONLY
    (term, doc_id, position): the per-doc weight inputs reach the kernel
    via a broadcast array (doc_weight_arrays), so the range shuffle +
    external sort move 16 fewer bytes per token occurrence and no join
    appears in the plan at all.  The shuffle/sort is memory-BANDWIDTH-bound
    at high parallelism (tools/host_capacity_probe.py --bw: this host
    streams at ~0.43 scaling efficiency 8->32 vs 0.68-0.71 for pure
    compute), so shuffled bytes — not cycles — are the scaling bottleneck.

    Above the cutoff the weights are joined on per-row: doc_id-bucketed
    sort-merge is the intended plan at 10^12 scale (the optimizer sizes
    the FULL doc_stats frame, so no broadcast would apply there anyway)
    and the kernel reads doc_len/l2_weight off its input columns.

    Next bytes-lever at 10^12 turns (not yet needed at sandbox scale):
    dictionary-encode ``term`` to an int id before this shuffle (the stem
    dictionary the build already broadcasts is the natural id space) so the
    range shuffle moves 16-byte rows instead of repeated strings —
    shuffle-heavy stages on wide executors are DRAM-bandwidth-bound
    (BENCH.md), so bytes, not cycles, are the scaling currency.

    ``carry_weights`` overrides the size-based default: True forces the
    per-row join (used when the broadcast-array path declined — sparse
    doc_ids), False forces the bare stream."""
    if carry_weights is None:
        carry_weights = n_docs > BROADCAST_WEIGHTS_MAX_DOCS
    stream = tokens.filter(F.col("term") != "")
    if carry_weights:
        stream = stream.join(
            doc_stats.select("doc_id", "doc_len", "l2_weight"), "doc_id"
        )
    return (
        stream.repartitionByRange(n_partitions, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id", "position")
    )


def prepare_transcripts(df: DataFrame) -> DataFrame:
    """Transcript table (input_hint schema) -> docs: one turn = one document;
    title = conv_id:turn_idx (SURVEY.md §1.3)."""
    docs = assign_doc_ids(df)
    out = docs.withColumn("title", F.concat_ws(":", "conv_id", "turn_idx"))
    out._docid_cache = docs._docid_cache
    out._n_docs = docs._n_docs
    return out


def _write(df: DataFrame, path: str, sort_partition: bool = False) -> None:
    df.write.mode("overwrite").parquet(path)


def _partition_lineage(path: str) -> list[dict]:
    """Per-partition lineage for a written artifact (north rule): one entry
    per output file with row count and byte size, read from the parquet
    FOOTERS driver-side — no Spark job, no data scan."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        out.append(
            {
                "file": name,
                "rows": pq.ParquetFile(fp).metadata.num_rows,
                "bytes": os.path.getsize(fp),
            }
        )
    return out


class IndexBuilder:
    def __init__(self, spark: SparkSession, out_dir: str, n_partitions: int | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.n_partitions = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        self.manifest: dict = {"stages": {}, "metrics": {}}

    # -- manifest / resume -------------------------------------------------
    def _load_manifest(self) -> None:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def _save_manifest(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self.manifest_path)

    def _stage_done(self, name: str) -> bool:
        info = self.manifest["stages"].get(name)
        if not info:
            return False
        path = os.path.join(self.out_dir, name)
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    def _mark_stage(self, name: str, **extra) -> None:
        entry = {"completed_at": time.time(), **extra}
        path = os.path.join(self.out_dir, name)
        if os.path.isdir(path):
            lineage = _partition_lineage(path)
            entry["n_files"] = len(lineage)
            entry["partitions"] = lineage
        self.manifest["stages"][name] = entry
        self._save_manifest()

    # -- build --------------------------------------------------------------
    def build(self, docs: DataFrame, resume: bool = False) -> dict:
        """docs: (doc_id:long, text:string [, title, conv_id, turn_idx, role,
        tool]).  Returns the manifest dict.  Runs under pinned build shuffle
        config (see pinned_build_conf) so a session that served queries
        (SparkIndex.warm flips AQE coalescing on) still builds at full
        shuffle width.

        EVERY build shuffle — the stats-phase (term, doc_id) aggregation as
        much as the postings range shuffle — is sized by DATA with the
        session width as floor: a reduce partition is a sorted/hash-agg
        working set, and core-count-sized partitions grow with the corpus
        until they outrun the memory hierarchy (measured: 1.8M turns at 8
        tasks built in 675 s with the stats shuffle at 8 partitions vs
        280 s with every shuffle at ~31 — the postings shuffle alone being
        data-sized recovered less than half the loss).  The corpus size is
        free at this point: assign_doc_ids attaches its counting-pass total
        as ``_n_docs``."""
        n_docs_hint = getattr(docs, "_n_docs", None)
        sp_build = self.n_partitions
        if n_docs_hint:
            sp_build = max(sp_build, -(-int(n_docs_hint) // DOCS_PER_POSTINGS_PARTITION))
        prev_sp = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(sp_build))
        self._sp_build = sp_build
        try:
            with pinned_build_conf(self.spark):
                return self._build(docs, resume=resume)
        finally:
            self.spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    def _build(self, docs: DataFrame, resume: bool = False) -> dict:
        t0 = time.time()
        if resume:
            self._load_manifest()

        spark = self.spark
        out = self.out_dir
        meta_cols = [c for c in ("title", *META_COLS) if c in docs.columns]
        # phase labels surface in the Spark UI / REST API so per-stage
        # metrics (tools/stage_profile.py) attribute cleanly; job
        # descriptions are thread-local, so the background stats writer
        # labels its own jobs separately
        set_desc = spark.sparkContext.setJobDescription

        # persisted: docs feeds two consumers (the tokenize type stream and
        # the doc_stats meta projection); when it comes from assign_doc_ids
        # each recompute would repeat the Arrow enumeration pass over the
        # ranged cache — measured ~20% slower end-to-end than caching the
        # enumerated frame once.
        docs = docs.persist()  # lazily materialized by the first stage

        # tokens including empty terms (doc_length/L_d accounting,
        # spimi.py:74-93).  The post-cleaning type stream is cached
        # (persist_types): the stem-dictionary subquery, the stats
        # aggregation, the range partitioner's sampling pass, and the final
        # postings pass would otherwise each re-run the explode+regex chain.
        tokens = tokenize(docs, text_col="text", id_col="doc_id", persist_types=True)

        # B1 for stats only: tf per (term, doc) via codegen hash agg — counts
        # only, so Tungsten's unsafe-row aggregation applies (the
        # positions-array aggregation deliberately does NOT run through
        # collect_list: ObjectHashAggregate is object-based, GC-bound, and
        # falls back to sort-based at 128 keys — measured 3-6x slower than
        # the sort+kernel path below at 150k turns).
        tf_table = tokens.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))

        # B5/B6: per-doc stats (include the empty term, exclude nothing).
        # The frame is persisted and materialized by the corpus-stats
        # aggregation (which the build needs anyway for avgdl); the parquet
        # writes then run in a BACKGROUND thread against the cache while the
        # main thread proceeds into the postings stage — the writes were a
        # pure serial barrier between the two data-proportional stages
        # (Spark job submission is thread-safe; the cache is materialized
        # before the thread starts, so no partition is computed twice).
        import threading

        stats_cache = None
        writer: threading.Thread | None = None
        writer_err: list[BaseException] = []
        # resume gate requires BOTH stats artifacts: they are written/marked
        # together now, but a manifest from a build that crashed between the
        # two writes could have doc_stats done and corpus_stats missing —
        # recompute the whole stats phase rather than fail the read-back
        stats_done = self._stage_done("doc_stats") and self._stage_done("corpus_stats")
        if not stats_done or not resume:
            stats_cache = (
                docs.select("doc_id", *meta_cols)
                .join(doc_stats_table(tf_table), "doc_id", "left")
                .fillna({"doc_len": 0})
                .persist()
            )
            doc_stats = stats_cache
            set_desc("phase:stats — materialize doc/type caches + corpus stats")
            stats_row = corpus_stats_table(stats_cache).collect()[0]
            # Data-wise the RANGED corpus cache behind assign_doc_ids is
            # redundant from here on (the corpus-stats action materialized
            # the enumerated docs + token type caches), but it must NOT be
            # released mid-build: Dataset.unpersist() makes the CacheManager
            # re-register every dependent cache entry (docs, types,
            # stats_cache) and CLEAR their materialized buffers, so the
            # postings phase silently recomputed all three — measured 27%
            # slower end-to-end than carrying both text copies (which are
            # MEMORY_AND_DISK — the second copy costs disk, not heap) to the
            # single release at the end of the build.

            def write_stats() -> None:
                try:
                    set_desc("phase:stats-write (background) — doc_stats + corpus_stats parquet")
                    _write(stats_cache, os.path.join(out, "doc_stats"))
                    _write(
                        corpus_stats_table(stats_cache), os.path.join(out, "corpus_stats")
                    )
                except BaseException as e:  # surfaced after join()
                    writer_err.append(e)

            writer = threading.Thread(target=write_stats, daemon=True)
            writer.start()
        else:
            doc_stats = spark.read.parquet(os.path.join(out, "doc_stats"))
            stats_row = spark.read.parquet(os.path.join(out, "corpus_stats")).collect()[0]

        avgdl = float(stats_row["avgdl"])
        n_docs = int(stats_row["n_docs"])

        # B2/B3 + K3/K4: the SPIMI sort-merge as ONE range shuffle.  Token
        # rows — bare (term, doc_id, position) at sandbox scale, the weight
        # inputs riding a broadcast array into the kernel; doc_id-bucketed
        # SMJ enrichment at 10^12 scale — are range-partitioned on
        # (term, doc_id) — hot terms split across partitions, defusing skew
        # — sorted by (term, doc_id, position), and a vectorized numpy
        # kernel forms (tf, positions, wdt_*) per group in one linear pass.
        # No object aggregation anywhere; spill is the engine's external
        # sort.  Empty terms are excluded from the index (spimi.py:137)
        # after stats, matching the reference.
        # Postings range-shuffle width: the data-aware build width (see
        # build()), re-maxed against the EXACT n_docs in case the builder
        # was invoked without the assign_doc_ids hint (file corpora, resume).
        postings_partitions = max(
            getattr(self, "_sp_build", self.n_partitions),
            -(-n_docs // DOCS_PER_POSTINGS_PARTITION),
        )
        postings_cache = None
        weights_bc = None
        if not self._stage_done("postings") or not resume:
            if n_docs <= BROADCAST_WEIGHTS_MAX_DOCS:
                set_desc("phase:postings — collect doc weight arrays")
                arrays = doc_weight_arrays(doc_stats, n_docs)
                if arrays is not None:
                    weights_bc = spark.sparkContext.broadcast(arrays)
            set_desc("phase:postings — range shuffle + kernel + parquet write")
            enriched = enriched_tokens(
                tokens,
                doc_stats,
                n_docs,
                postings_partitions,
                carry_weights=weights_bc is None,
            )
            # persisted so the segments stage encodes from the SAME sorted
            # partitions — no second range shuffle (at cluster scale the
            # equivalent is deriving segments from the just-written sorted
            # files without re-shuffling)
            postings_cache = enriched.mapInPandas(
                _postings_kernel(avgdl, weights_bc), schema=POSTINGS_SCHEMA
            ).persist()
            _write(postings_cache, os.path.join(out, "postings"))
            self._mark_stage("postings")

        if writer is not None:
            writer.join()
            if writer_err:
                raise writer_err[0]
            self._mark_stage("doc_stats")
            self._mark_stage("corpus_stats")
            stats_cache.unpersist()

        postings_df = spark.read.parquet(os.path.join(out, "postings"))

        # S5/B4: compressed block-max segments (delta+varbyte blobs; the
        # reference's postings.bin, spimi.py:145-187, plus the varbyte the
        # north rule adds) — encoded from the cached sorted postings when the
        # stage runs in the same build, else from a re-sorted read-back.
        if not self._stage_done("segments") or not resume:
            from .segments import encode_segments

            set_desc("phase:segments — varbyte block encode + write")
            if postings_cache is not None:
                seg_input = postings_cache
            else:
                seg_input = postings_df.repartitionByRange(
                    postings_partitions, "term", "doc_id"
                ).sortWithinPartitions("term", "doc_id")
            _write(encode_segments(seg_input), os.path.join(out, "segments"))
            self._mark_stage("segments")
        if postings_cache is not None:
            postings_cache.unpersist()
        if weights_bc is not None:
            # postings + segments both materialized above; free the worker-side
            # weight arrays (they would otherwise pin ~16 bytes/doc per worker
            # for the life of the session)
            weights_bc.unpersist()

        # B7 + block-max metadata: the broadcastable dictionary.  Per-term
        # block-max tops ride along (top-32 block maxima, min block max,
        # block count, per scoring mode) so WAND derives its theta lower
        # bound and prune-or-fall-through decision from the SAME tiny
        # dictionary collect it already pays — zero extra jobs at query time
        # (wand.py metadata mode).
        if not self._stage_done("term_stats") or not resume:
            set_desc("phase:term_stats — dictionary + block-max meta")
            term_stats = term_stats_with_block_meta(
                postings_df, spark.read.parquet(os.path.join(out, "segments"))
            )
            _write(term_stats.repartitionByRange(max(1, self.n_partitions // 4), "term"), os.path.join(out, "term_stats"))
            self._mark_stage("term_stats")

        # build metrics (north rule: postings/sec, skew ratio, lineage).
        # n_postings comes from the per-partition lineage (parquet footers)
        # recorded at stage completion — no re-scan of the postings table.
        elapsed = time.time() - t0
        set_desc("phase:metrics — manifest aggregates")
        # pre-lineage manifests (resumed builds recorded before per-partition
        # lineage existed) lack the "partitions" key — fall back to a count
        lineage = self.manifest["stages"]["postings"].get("partitions")
        n_postings = (
            sum(p["rows"] for p in lineage) if lineage else postings_df.count()
        )
        total_tokens = int(stats_row["total_tokens"])
        df_stats = (
            spark.read.parquet(os.path.join(out, "term_stats"))
            .agg(F.max("df").alias("max_df"), F.avg("df").alias("avg_df"))
            .collect()[0]
        )
        seg_stats = (
            spark.read.parquet(os.path.join(out, "segments"))
            .agg(
                F.count("*").alias("n_blocks"),
                F.sum(F.octet_length("postings_bin")).alias("bytes_compressed"),
            )
            .collect()[0]
        )
        self.manifest["metrics"] = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "n_postings": n_postings,
            "build_seconds": elapsed,
            "docs_per_sec": n_docs / elapsed if elapsed else None,
            "postings_per_sec": n_postings / elapsed if elapsed else None,
            "skew_ratio_max_df_over_avg_df": (df_stats["max_df"] / df_stats["avg_df"]) if df_stats["avg_df"] else None,
            "n_segment_blocks": int(seg_stats["n_blocks"]),
            "segment_bytes_compressed": int(seg_stats["bytes_compressed"] or 0),
            "n_partitions": self.n_partitions,
            "avgdl": avgdl,
        }
        self._save_manifest()
        if hasattr(tokens, "_types_cache"):
            tokens._types_cache.unpersist()
        docs.unpersist()
        # release the docID cache behind OUR input frame.  The scoped handle
        # is a plain attribute that intermediate transformations drop; when
        # it is missing, drain the registry only if it holds exactly ONE
        # cache (the unambiguous single-producer case) — draining all of
        # them would evict other in-flight builders' caches and force
        # recomputes.  Multi-builder sessions that transform the frame
        # between assign_doc_ids and build() own the release via
        # release_docid_caches() / release_docid_cache_of().
        if not release_docid_cache_of(docs) and len(_DOCID_CACHES) == 1:
            release_docid_caches()
        set_desc(None)
        return self.manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_partitions: int | None = None,
    resume: bool = False,
) -> dict:
    return IndexBuilder(spark, out_dir, n_partitions).build(docs, resume=resume)


def bm25_wqt(n_docs: int, df: int) -> float:
    """K2 (rankedquery.py:12-13)."""
    return max(0.1, math.log((n_docs - df + 0.5) / (df + 0.5)))


def tfidf_wqt(n_docs: int, df: int) -> float:
    """K1 (rankedquery.py:14-16)."""
    return math.log(1 + n_docs / df)
