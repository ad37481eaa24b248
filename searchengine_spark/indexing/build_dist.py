"""Over-cutoff dictionary-encoded build: the packed-int shuffle at web scale.

``_build_encoded`` (build.py) collects the type vocabulary to the driver and
broadcasts dense term_ids + doc-weight arrays into the kernels — the right
plan below VOCAB_ENCODE_MAX types / BROADCAST_WEIGHTS_MAX_DOCS docs, and a
non-plan above them (a 10^9-type vocabulary is neither collectable nor
broadcastable).  This module is the SAME packed-int design with every
driver-side structure replaced by a distributed equivalent, so the build
that beat the measured DRAM-bandwidth wall survives web-scale vocabularies
instead of falling back to the string shuffle (round-4 verdict, top item):

  * doc weights: computed map-side inside the tokenize pass (every doc is a
    single row, so per-doc stats are partition-local) and CARRIED on the
    token rows — no broadcast, no join, no extra shuffle
    (_fused_tokenize_stats_kernel);
  * term_ids: dense ids in sorted-term order assigned distributively —
    vocab-sized groupBy (map-side combined over the token stream),
    range-partition + sort, per-partition offsets (one tiny collect of
    2 longs/partition), zero-shuffle enumeration — the assign_doc_ids
    trick applied to the dictionary (_assign_term_ids);
  * the encode join: tokens join the (type -> term_id) dictionary.  The
    dictionary is not broadcastable, but token mass is Zipfian — the top
    HOT_TYPES_K types carry most occurrences — so the HOT slice of the
    dictionary broadcasts and joins map-side while only the bounded cold
    tail (every cold type's count <= the K-th hot count) pays the shuffle
    join: the skew that would hot-spot a hash(type) shuffle is exactly the
    mass that never enters it;
  * partition plan: contiguous term ranges from the dictionary's global
    token cumsum (base = cum_before // target, hot terms striped by
    doc_id % ksplit), routed through murmur3-representative values like the
    driver plan — same balance law, computed from the dictionary instead of
    a driver array.  (The in-memory path's greedy packer closes partitions
    early, so file boundaries can differ between the two paths; contents,
    per-term order, and every query answer are identical — asserted by
    tests/test_dist_build.py.)
  * term strings for the output: dictionary slices are EXPLODED onto their
    planned partitions and ride the SAME route shuffle as the tokens
    (kind=0 rows sort first); the kernel rebuilds its partition's dense
    id -> term table locally.  No postings-sized re-shuffle to restore
    strings, no vocab broadcast.

Shuffle inventory over the token stream: ONE map-side-combined aggregation
(vocab-sized output), ONE shuffle join for the cold tail only, ONE planned
route shuffle of (packed:int64, doc_len:int32, l2:float64) rows.  Everything
else is vocab-sized or smaller.

Reference parity: artifacts and semantics identical to build.py's paths
(engine/indexing/spimi.py:56-298 for the SPIMI contract); gates pin it.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .logical import BM25_B, BM25_K1

# token rows carry the per-doc weight inputs; stats pseudo-rows use
# position = -1 (one per doc, filtered apart by consumers)
WEIGHTED_TYPES_SCHEMA = (
    "doc_id long, position int, type string, doc_len int, l2_weight double"
)
DICT_SCHEMA = "term string, term_id int, tokens long, base int, ksplit int"

# bit budget for the single-long sort key; beyond it the route shuffle
# carries (term_id, doc_id, position) fixed-width ints instead (tests
# force the overflow by patching this down)
PACK_MAX_BITS = 63
# hot slice of the dictionary that joins map-side (broadcast): ~64k types
# of a Zipfian vocabulary carry the large majority of token occurrences,
# and every COLD type's count is bounded by the K-th hot count — the
# shuffle join that remains is skew-free by construction
HOT_TYPES_K = 65_536
# dictionary-shuffle sizing: one reduce partition per ~2M distinct terms
TERMS_PER_DICT_PARTITION = 2_000_000


def _fused_tokenize_stats_kernel(text_col: str, id_col: str, attach_weights: bool = True):
    """(doc_id, text) batches -> token rows WITH per-doc weights attached,
    plus one stats pseudo-row (position = -1) per non-empty doc.

    ``attach_weights=False`` (the ENCODED build's variant, where weights
    reach the kernels by broadcast) leaves the token rows' doc_len/l2
    columns null — the columnar cache RLE-compresses them to nothing —
    while still emitting the stats pseudo-rows: doc stats then cost ZERO
    extra passes (they ride the tokenize pass), which removed the encoded
    path's separate stats-kernel scan over the cache (round-5 fixed-cost
    work; measured 19.6 s of a 142 s width-4 900k-turn build).

    Composes the T1-T3 Arrow kernel (spark_tokenize._types_kernel — exact
    split/hyphen/cleaning semantics, asserted against the expression twin)
    with partition-local doc stats: each doc is one input row, so its full
    type multiset is present in one output batch and doc_len / L_d
    (spimi.py:74-123 — the empty term counts toward both) reduce locally.
    Stemming for the L_d term-grouping runs over the partition's DISTINCT
    types via a cross-batch memo — O(partition vocab), not O(tokens), the
    same dictionary-normalization cost law as the broadcast path.

    Empty types contribute to the stats and are then DROPPED from the token
    output (the index excludes them, spimi.py:137) — they never enter the
    encode join or the route shuffle."""

    from ..text.spark_tokenize import _types_kernel

    inner = _types_kernel(text_col, id_col)

    def fn(iterator):
        import numpy as np
        import pandas as pd

        from searchengine_spark.text.porter2 import stem

        type2sid: dict = {}  # type -> local stem-id (equal stems share an id)
        stem_ids: dict = {}

        for pdf in inner(iterator):
            if not len(pdf):
                continue
            codes, uniques = pd.factorize(pdf["type"], sort=False)
            sid_for_unique = np.empty(len(uniques), dtype=np.int64)
            for i, t in enumerate(uniques):
                sid = type2sid.get(t)
                if sid is None:
                    s = stem(t)
                    sid = stem_ids.setdefault(s, len(stem_ids))
                    type2sid[t] = sid
                sid_for_unique[i] = sid
            sids = sid_for_unique[codes]
            docs_np = pdf[id_col].to_numpy(dtype=np.int64)
            # hyphen expansion groups variants, so rows are NOT doc-sorted:
            # lexsort per batch (docs are complete within a batch)
            order = np.lexsort((sids, docs_np))
            d_s, s_s = docs_np[order], sids[order]
            n = len(d_s)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])
            starts = np.flatnonzero(change)
            tf = np.diff(np.append(starts, n)).astype(np.int64)
            gdoc = d_s[starts]
            dchange = np.empty(len(gdoc), dtype=bool)
            dchange[0] = True
            dchange[1:] = gdoc[1:] != gdoc[:-1]
            dstarts = np.flatnonzero(dchange)
            udoc = gdoc[dstarts]
            doc_len = np.add.reduceat(tf, dstarts)
            w = np.square(1.0 + np.log(tf.astype(np.float64)))
            l2 = np.sqrt(np.add.reduceat(w, dstarts))
            keep = pdf["type"].to_numpy() != ""
            out = {
                "doc_id": docs_np[keep],
                "position": pdf["position"].to_numpy(dtype=np.int32)[keep],
                "type": pdf["type"].to_numpy()[keep],
            }
            if attach_weights:
                # per-row weight attach: row doc -> index into udoc (sorted)
                row_di = np.searchsorted(udoc, docs_np)
                out["doc_len"] = doc_len[row_di[keep]].astype(np.int32)
                out["l2_weight"] = l2[row_di[keep]]
            else:
                out["doc_len"] = None
                out["l2_weight"] = None
            out = pd.DataFrame(out)
            stats = pd.DataFrame(
                {
                    "doc_id": udoc,
                    "position": np.full(len(udoc), -1, dtype=np.int32),
                    "type": None,
                    "doc_len": doc_len.astype(np.int32),
                    "l2_weight": l2,
                }
            )
            yield pd.concat([out, stats], ignore_index=True)

    return fn


def _dict_enum_kernel(id_offsets: dict, tok_offsets: dict, target: int):
    """Zero-shuffle enumeration over the range-partitioned sorted term
    frame: term_id = partition id-offset + running index (dense, global
    sorted-term order — ordering by term_id IS ordering by term), plus the
    partition plan derived from the global token cumsum the same offsets
    provide: base = cum_before // target (contiguous ~target-token ranges),
    ksplit = ceil(tokens / target) (hot terms stripe across dedicated
    partitions by doc_id % ksplit — the explicit skew defusal).  Stripe
    ranges of consecutive terms stay contiguous, so every route partition
    holds a contiguous term range and parquet min/max pruning survives."""

    def fn(iterator):
        import numpy as np
        import pandas as pd

        seen_ids = 0
        seen_toks = 0
        pid = None
        for pdf in iterator:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            toks = pdf["tokens"].to_numpy(dtype=np.int64)
            cum_before = tok_offsets[pid] + seen_toks + (np.cumsum(toks) - toks)
            term_id = id_offsets[pid] + seen_ids + np.arange(len(pdf), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "term": pdf["term"].to_numpy(),
                    "term_id": term_id.astype(np.int32),
                    "tokens": toks,
                    "base": (cum_before // target).astype(np.int32),
                    "ksplit": (-(-toks // target)).astype(np.int32),
                }
            )
            seen_ids += len(pdf)
            seen_toks += int(toks.sum())

    return fn


def _assign_term_ids(terms: DataFrame, target: int, width: int):
    """Distributed dense sorted term_ids + partition plan.  Returns
    (term_dict DataFrame persisted, ranged cache handle, V, total_tokens)."""
    spark = terms.sparkSession
    k = max(1, width)
    ranged = (
        terms.repartitionByRange(k, "term")
        .sortWithinPartitions("term")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    pstats = (
        ranged.groupBy("_pid")
        .agg(F.count("*").alias("n"), F.sum("tokens").alias("t"))
        .collect()
    )
    id_offsets: dict[int, int] = {}
    tok_offsets: dict[int, int] = {}
    acc_id = acc_tok = 0
    for row in sorted(pstats, key=lambda r: r["_pid"]):
        id_offsets[row["_pid"]] = acc_id
        tok_offsets[row["_pid"]] = acc_tok
        acc_id += row["n"]
        acc_tok += int(row["t"])
    term_dict = ranged.mapInPandas(
        _dict_enum_kernel(id_offsets, tok_offsets, target), schema=DICT_SCHEMA
    ).persist()
    return term_dict, ranged, acc_id, acc_tok


def _local_id2term(dict_tids, dict_terms):
    """Partition-local dense id -> term table from the kind=0 dictionary
    rows that rode the route shuffle.  Routes are contiguous term ranges,
    so the slice is dense — verified, with a dict fallback that keeps a
    non-dense slice correct rather than wrong."""
    import numpy as np

    tids = np.asarray(dict_tids, dtype=np.int64)
    terms = np.asarray(dict_terms, dtype=object)
    if len(tids) == 0:
        return 0, terms, None
    order = np.argsort(tids)
    tids, terms = tids[order], terms[order]
    if np.all(np.diff(tids) == 1):
        return int(tids[0]), terms, None
    return 0, None, {int(t): s for t, s in zip(tids, terms)}


def _postings_kernel_dist(avgdl: float, pack_bits: tuple[int, int] | None):
    """_postings_kernel_packed without broadcasts: term strings come from
    the partition's kind=0 dictionary rows (sorted first), weight inputs
    ride the token rows (doc_len, l2_weight — constant within a
    (term, doc) group, read at group starts).  Streaming carry identical
    to the in-memory kernels: O(batch + largest group) memory."""

    packed_mode = pack_bits is not None

    def fn(iterator):
        import numpy as np
        import pandas as pd

        dict_tids: list = []
        dict_terms: list = []
        lookup = None  # (tid0, dense_terms, fallback_map)

        if packed_mode:
            d_bits, p_bits = pack_bits
            pmask = (1 << p_bits) - 1
            dmask = (1 << d_bits) - 1

        def cols(pdf):
            if packed_mode:
                packed = pdf["packed"].to_numpy(dtype=np.int64)
                tid = packed >> (d_bits + p_bits)
                doc = (packed >> p_bits) & dmask
                pos = packed & pmask
            else:
                tid = pdf["term_id"].to_numpy(dtype=np.int64)
                doc = pdf["doc_id"].to_numpy(dtype=np.int64)
                pos = pdf["position"].to_numpy(dtype=np.int64)
            return (
                tid,
                doc,
                pos,
                pdf["doc_len"].to_numpy(dtype=np.float64),
                pdf["l2_weight"].to_numpy(dtype=np.float64),
            )

        def terms_of(tid_starts):
            tid0, dense, fallback = lookup
            if dense is not None:
                return dense[tid_starts - tid0]
            return np.array([fallback[int(t)] for t in tid_starts], dtype=object)

        def process(tid, doc, pos, dl, l2):
            n = len(tid)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (tid[1:] != tid[:-1]) | (doc[1:] != doc[:-1])
            starts = np.flatnonzero(change)
            tf = np.diff(np.append(starts, n)).astype(np.int64)
            tf_f = tf.astype(np.float64)
            dl_g = dl[starts]
            l2_g = l2[starts]
            return pd.DataFrame(
                {
                    "term": terms_of(tid[starts]),
                    "doc_id": doc[starts],
                    "tf": tf,
                    "positions": np.split(pos, starts[1:]),
                    "wdt_bm25": ((BM25_K1 + 1.0) * tf_f)
                    / (BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl_g / avgdl)) + tf_f),
                    "wdt_tfidf_norm": (1.0 + np.log(tf_f)) / l2_g,
                }
            )

        carry = None
        for pdf in iterator:
            if not len(pdf):
                continue
            kind = pdf["kind"].to_numpy()
            if kind[0] == 0:
                dmask_rows = kind == 0
                dpdf = pdf[dmask_rows]
                if packed_mode:
                    dict_tids.extend(dpdf["packed"].tolist())
                else:
                    dict_tids.extend(dpdf["term_id"].tolist())
                dict_terms.extend(dpdf["term"].tolist())
                pdf = pdf[~dmask_rows]
                if not len(pdf):
                    continue
            if lookup is None:
                lookup = _local_id2term(dict_tids, dict_terms)
            arrs = cols(pdf)
            if carry is not None:
                arrs = tuple(np.concatenate([c, a]) for c, a in zip(carry, arrs))
                carry = None
            tid, doc = arrs[0], arrs[1]
            # hold back the trailing (term, doc) group
            last_t, last_d = tid[-1], doc[-1]
            tail = (tid == last_t) & (doc == last_d)
            split_at = len(tid) - int(tail[::-1].cumprod().sum())
            carry = tuple(a[split_at:] for a in arrs)
            if split_at:
                yield process(*(a[:split_at] for a in arrs))
        if carry is not None and len(carry[0]):
            yield process(*carry)

    return fn


def _segments_kernel_dist(avgdl: float, pack_bits: tuple[int, int] | None):
    """Block-max segment encoder over the SAME sorted routed partitions
    (see _segments_kernel_packed for the layout contract): whole partition
    buffered so block boundaries are deterministic; weights recomputed with
    the same expressions/order as the postings kernel so block maxima match
    the postings values bit-for-bit; term strings from the partition's
    dictionary rows."""

    packed_mode = pack_bits is not None

    def fn(iterator):
        import numpy as np
        import pandas as pd

        from searchengine_spark.indexing.codec import encode_block
        from searchengine_spark.indexing.segments import BLOCK_SIZE

        dict_tids: list = []
        dict_terms: list = []
        tid_c: list = []
        doc_c: list = []
        pos_c: list = []
        dl_c: list = []
        l2_c: list = []

        if packed_mode:
            d_bits, p_bits = pack_bits
            pmask = (1 << p_bits) - 1
            dmask = (1 << d_bits) - 1

        for pdf in iterator:
            if not len(pdf):
                continue
            kind = pdf["kind"].to_numpy()
            if kind[0] == 0:
                sel = kind == 0
                dpdf = pdf[sel]
                if packed_mode:
                    dict_tids.extend(dpdf["packed"].tolist())
                else:
                    dict_tids.extend(dpdf["term_id"].tolist())
                dict_terms.extend(dpdf["term"].tolist())
                pdf = pdf[~sel]
                if not len(pdf):
                    continue
            if packed_mode:
                packed = pdf["packed"].to_numpy(dtype=np.int64)
                tid_c.append(packed >> (d_bits + p_bits))
                doc_c.append((packed >> p_bits) & dmask)
                pos_c.append(packed & pmask)
            else:
                tid_c.append(pdf["term_id"].to_numpy(dtype=np.int64))
                doc_c.append(pdf["doc_id"].to_numpy(dtype=np.int64))
                pos_c.append(pdf["position"].to_numpy(dtype=np.int64))
            dl_c.append(pdf["doc_len"].to_numpy(dtype=np.float64))
            l2_c.append(pdf["l2_weight"].to_numpy(dtype=np.float64))
        if not tid_c:
            return
        tid = np.concatenate(tid_c)
        doc = np.concatenate(doc_c)
        flat_pos = np.concatenate(pos_c).astype(np.uint64)
        dl_rows = np.concatenate(dl_c)
        l2_rows = np.concatenate(l2_c)
        del tid_c, doc_c, pos_c, dl_c, l2_c
        tid0, dense, fallback = _local_id2term(dict_tids, dict_terms)

        n = len(tid)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (tid[1:] != tid[:-1]) | (doc[1:] != doc[:-1])
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, n))
        gtid = tid[starts]
        gdoc = doc[starts].astype(np.uint64)
        dl = dl_rows[starts]
        l2 = l2_rows[starts]
        tf_f = tf.astype(np.float64)
        w_bm = ((BM25_K1 + 1.0) * tf_f) / (
            BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl)) + tf_f
        )
        w_ti = (1.0 + np.log(tf_f)) / l2
        tfs = tf.astype(np.uint64)
        pos_off = np.concatenate(([0], np.cumsum(tf))).astype(np.int64)
        tchange = np.empty(len(gtid), dtype=bool)
        tchange[0] = True
        tchange[1:] = gtid[1:] != gtid[:-1]
        tstarts = np.flatnonzero(tchange)
        tends = np.append(tstarts[1:], len(gtid))
        if dense is not None:
            run_terms = dense[gtid[tstarts] - tid0]
        else:
            run_terms = np.array([fallback[int(t)] for t in gtid[tstarts]], dtype=object)

        out = {k: [] for k in (
            "term", "n_postings", "doc_id_min", "doc_id_max",
            "max_wdt_bm25", "max_wdt_tfidf_norm", "sum_tf", "postings_bin",
        )}
        for ti in range(len(tstarts)):
            s0, e0 = int(tstarts[ti]), int(tends[ti])
            term = run_terms[ti]
            for s in range(s0, e0, BLOCK_SIZE):
                e = min(s + BLOCK_SIZE, e0)
                out["term"].append(term)
                out["n_postings"].append(e - s)
                out["doc_id_min"].append(int(gdoc[s]))
                out["doc_id_max"].append(int(gdoc[e - 1]))
                out["max_wdt_bm25"].append(float(w_bm[s:e].max()))
                out["max_wdt_tfidf_norm"].append(float(w_ti[s:e].max()))
                out["sum_tf"].append(int(tfs[s:e].sum()))
                out["postings_bin"].append(
                    encode_block(gdoc[s:e], tfs[s:e], flat_pos[pos_off[s] : pos_off[e]])
                )
        yield pd.DataFrame(out)

    return fn


def build_encoded_dist(builder, docs: DataFrame, n_docs: int, resume: bool = False) -> dict:
    """Orchestrate the distributed dictionary-encoded build (module
    docstring).  ``builder`` is the IndexBuilder — manifest/resume/_finish
    are shared with the in-memory paths so artifacts, metrics, and the
    segments/term_stats tail are byte-for-byte the same machinery."""
    import threading

    from . import build as B

    t0 = time.time()
    phases: dict[str, float] = {}
    _last = [t0]

    def lap(name: str) -> None:
        now = time.time()
        phases[name] = round(now - _last[0], 3)
        _last[0] = now

    if resume:
        builder._load_manifest()
    spark = builder.spark
    out = builder.out_dir
    meta_cols = [c for c in ("title", *B.META_COLS) if c in docs.columns]
    set_desc = spark.sparkContext.setJobDescription

    docs = docs.persist()
    weighted = (
        docs.select("doc_id", "text")
        .mapInPandas(
            _fused_tokenize_stats_kernel("text", "doc_id"),
            schema=WEIGHTED_TYPES_SCHEMA,
        )
        .persist()
    )
    tokens = weighted.filter(F.col("position") >= 0)

    # -- stats: pseudo-rows from the fused kernel (zero shuffle), ONE 1-row
    # collect for corpus stats + the pack-bit budget; artifact writes
    # overlap the dictionary/postings phases in a background thread.
    stats_done = builder._stage_done("doc_stats") and builder._stage_done("corpus_stats")
    fresh_stats = not stats_done or not resume
    if fresh_stats:
        stats_df = weighted.filter(F.col("position") < 0).select(
            "doc_id", F.col("doc_len").cast("long").alias("doc_len"), "l2_weight"
        )
    else:
        stats_df = (
            builder._read_stage("doc_stats")
            .select("doc_id", "doc_len", "l2_weight")
            .filter(F.col("doc_len") > 0)
        )
    set_desc("phase:stats — fused-kernel materialize + 1-row corpus collect")
    srow = stats_df.agg(
        F.sum("doc_len").alias("total"),
        F.max("doc_len").alias("max_dl"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    ).collect()[0]
    total_tokens = int(srow["total"] or 0)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    max_dl = int(srow["max_dl"] or 0)
    min_doc = int(srow["min_doc"] if srow["min_doc"] is not None else 0)
    max_doc = int(srow["max_doc"] if srow["max_doc"] is not None else 0)
    lap("stats_collect")

    writer: threading.Thread | None = None
    writer_err: list[BaseException] = []
    if fresh_stats:

        def write_stats() -> None:
            try:
                set_desc("phase:stats-write (background) — doc_stats + corpus_stats parquet")
                full = (
                    docs.select("doc_id", *meta_cols)
                    .join(stats_df, "doc_id", "left")
                    .fillna({"doc_len": 0})
                )
                builder._write_stage(full, "doc_stats")
                corpus_df = spark.createDataFrame(
                    [(n_docs, total_tokens, float(avgdl))],
                    "n_docs bigint, total_tokens bigint, avgdl double",
                )
                builder._write_stage(corpus_df, "corpus_stats")
            except BaseException as e:  # surfaced after join()
                writer_err.append(e)

        writer = threading.Thread(target=write_stats, daemon=True)
        writer.start()

    routed_cache = None
    seg_kernel = None
    pack_bits = None
    postings_partitions = max(
        getattr(builder, "_sp_build", builder.n_partitions),
        -(-n_docs // B.DOCS_PER_POSTINGS_PARTITION) if n_docs else 1,
    )
    if not builder._stage_done("postings") or not resume:
        # -- dictionary: one map-side-combined aggregation over the token
        # stream (vocab-sized output), stems over the VOCAB (same O(|vocab|)
        # law as every other path), dense sorted ids + plan distributively.
        set_desc("phase:dict — vocab aggregation + distributed id assignment")
        from ..text.spark_tokenize import _stem_udf

        typed = (
            tokens.groupBy("type")
            .agg(F.count("*").alias("c"))
            .withColumn("term", _stem_udf(F.col("type")))
            .filter(F.col("term") != "")
            .persist()
        )
        terms = typed.groupBy("term").agg(F.sum("c").alias("tokens"))
        # ONE vocab-cache action fuses the dictionary-shuffle sizing input
        # (distinct types upper-bound distinct terms) with the exact
        # indexable-token total the route plan needs
        vrow = typed.agg(
            F.count("*").alias("n_types"), F.sum("c").alias("tok_total")
        ).collect()[0]
        n_types = int(vrow["n_types"] or 0)
        total_route_tokens = int(vrow["tok_total"] or 0)
        dict_width = max(
            builder.n_partitions, -(-n_types // TERMS_PER_DICT_PARTITION) if n_types else 1
        )
        # route-shuffle sizing: same data law as the in-memory paths
        target_tokens = max(1, -(-total_route_tokens // postings_partitions))
        term_dict, ranged, V, _tok_total = _assign_term_ids(
            terms, target_tokens, dict_width
        )
        prow = term_dict.agg(
            F.max(F.col("base") + F.col("ksplit")).alias("p")
        ).collect()[0]
        n_parts = max(1, int(prow["p"] or 1))
        ranged.unpersist()
        lap("dict_assign")

        # -- pack-bit budget (module constant patched down in tests to force
        # the 3-int variant)
        t_bits = max(1, int(V).bit_length())
        d_bits = max(1, int(max_doc + 1).bit_length())
        p_bits = max(1, int(max_dl + 1).bit_length())
        if min_doc >= 0 and t_bits + d_bits + p_bits <= PACK_MAX_BITS:
            pack_bits = (d_bits, p_bits)

        # -- encode join: hot slice broadcast (map-side, carries the skewed
        # mass), cold tail via shuffle join (counts bounded by the K-th hot
        # count — skew-free)
        set_desc("phase:postings — hot/cold encode join + planned route shuffle")
        hot_types = typed.orderBy(F.desc("c")).limit(HOT_TYPES_K).select("type")
        type_dict = (
            typed.select("type", "term")
            .join(term_dict.select("term", "term_id", "base", "ksplit"), "term")
            .select("type", "term_id", "base", "ksplit")
            .persist()
        )
        hot_dict = type_dict.join(F.broadcast(hot_types), "type")
        tok_hot = tokens.join(F.broadcast(hot_dict), "type")
        tok_cold = tokens.join(F.broadcast(hot_types), "type", "left_anti").join(
            type_dict, "type"
        )
        enc = tok_hot.unionByName(tok_cold)

        vmap = B._invert_partition_hash(n_parts)
        import pandas as pd

        route_df = spark.createDataFrame(
            pd.DataFrame({"part": range(n_parts), "_route": vmap.astype("int32")}),
            "part int, _route int",
        )
        part = (F.col("base") + F.pmod(F.col("doc_id"), F.col("ksplit"))).cast("int")
        enc = enc.withColumn("part", part).join(F.broadcast(route_df), "part")

        dict_routed = (
            term_dict.select(
                "term_id",
                "term",
                "base",
                F.explode(F.sequence(F.lit(0), F.col("ksplit") - 1)).alias("stripe"),
            )
            .withColumn("part", (F.col("base") + F.col("stripe")).cast("int"))
            .join(F.broadcast(route_df), "part")
        )
        if pack_bits is not None:
            db, pb = pack_bits
            packed = (
                F.shiftleft(F.col("term_id").cast("long"), db + pb)
                .bitwiseOR(F.shiftleft(F.col("doc_id"), pb))
                .bitwiseOR(F.col("position").cast("long"))
            )
            tok_rows = enc.select(
                F.lit(1).cast("tinyint").alias("kind"),
                packed.alias("packed"),
                "doc_len",
                "l2_weight",
                F.lit(None).cast("string").alias("term"),
                "_route",
            )
            dict_rows = dict_routed.select(
                F.lit(0).cast("tinyint").alias("kind"),
                F.col("term_id").cast("long").alias("packed"),
                F.lit(0).alias("doc_len"),
                F.lit(0.0).alias("l2_weight"),
                "term",
                "_route",
            )
            sort_cols = ("kind", "packed")
        else:
            tok_rows = enc.select(
                F.lit(1).cast("tinyint").alias("kind"),
                "term_id",
                "doc_id",
                "position",
                "doc_len",
                "l2_weight",
                F.lit(None).cast("string").alias("term"),
                "_route",
            )
            dict_rows = dict_routed.select(
                F.lit(0).cast("tinyint").alias("kind"),
                "term_id",
                F.lit(-1).cast("long").alias("doc_id"),
                F.lit(-1).alias("position"),
                F.lit(0).alias("doc_len"),
                F.lit(0.0).alias("l2_weight"),
                "term",
                "_route",
            )
            sort_cols = ("kind", "term_id", "doc_id", "position")
        routed_cache = (
            dict_rows.unionByName(tok_rows)
            .repartition(n_parts, F.col("_route"))
            .drop("_route")
            .sortWithinPartitions(*sort_cols)
            .persist()
        )
        builder._write_stage(
            routed_cache.mapInPandas(
                _postings_kernel_dist(avgdl, pack_bits), schema=B.POSTINGS_SCHEMA
            ),
            "postings",
        )
        builder._mark_stage("postings")
        # dictionary caches fed the route shuffle's map side — done now
        for c in (typed, term_dict, type_dict):
            c.unpersist()
        lap("postings")
        seg_kernel = _segments_kernel_dist(avgdl, pack_bits)
        postings_partitions = n_parts

    if writer is not None:
        writer.join()
        if writer_err:
            raise writer_err[0]
        builder._mark_stage("doc_stats")
        builder._mark_stage("corpus_stats")
        lap("stats_write_join")

    return builder._finish(
        t0=t0,
        phases=phases,
        lap=lap,
        docs=docs,
        n_docs=n_docs,
        avgdl=avgdl,
        total_tokens=total_tokens,
        postings_cache=None,
        weights_bc=None,
        postings_partitions=postings_partitions,
        set_desc=set_desc,
        resume=resume,
        types_cache=weighted,
        packed_cache=routed_cache,
        seg_kernel=seg_kernel,
    )
