"""Block-max WAND top-k pruning over compressed segments (SURVEY.md §2 K6,
§7 Phase 4; north rule).

Distributed batch adaptation of Block-Max WAND (Ding & Suel, SIGIR 2011):
instead of a document-at-a-time cursor walk (meaningless across executors),
pruning happens at *block* granularity in two cheap passes over the segment
metadata, and only surviving blocks are varbyte-decoded.

For query terms t with weights wqt_t, every block B of term t has upper bound

    ub(B) = wqt_t * max_wdt(B) + sum_{t' != t} wqt_{t'} * gmax(t')

where gmax(t') is t's global max_wdt from term_stats.  For ANY doc d in B,
score(d) <= ub(B).  Hence if every block containing d is pruned
(ub <= theta for a valid lower bound theta on the k-th best score), d cannot
be in the top-k — pruning is *sound*; and any doc with a surviving block is
fully re-scored from the uncompressed postings (so partial scores can never
demote a true top-k doc).

Passes:
  1. theta estimation: decode just enough highest-ub blocks to cover
     ``oversample * k`` postings, exact-score those candidate docs, take the
     k-th best score.
  2. prune: keep blocks with ub > theta; decode survivors' doc_ids
     (vectorized numpy kernel in mapInPandas); union with pass-1 candidates;
     exact-score via the standard ranked plan restricted by a doc_id
     semi-join; top-k.

At 100 TB the win is that pass 2 reads only (term, max_wdt, postings_bin) for
the pruned-in fraction of blocks — the segment scan is metadata-cheap and the
expensive decode+score is skipped for the long tail of low-impact blocks.

The result is rank-identical to the exhaustive plan (tested), because
pruning only ever discards provably sub-threshold docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..indexing.build import bm25_wqt, tfidf_wqt
from ..indexing.index import SparkIndex
from ..text import preprocess_ranked_query

_DOCIDS_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


def _decode_doc_ids(iterator):
    import pandas as pd

    from searchengine_spark.indexing.codec import decode_block

    for pdf in iterator:
        ids: list[int] = []
        for blob in pdf["postings_bin"]:
            d, _t, _p = decode_block(bytes(blob))
            ids.extend(int(x) for x in d)
        yield pd.DataFrame({"doc_id": ids})


def _exact_scores(
    index: SparkIndex, weights: dict[str, float], wdt_col: str, candidates: DataFrame
) -> DataFrame:
    """Standard ranked plan (K1-K5) restricted to candidate doc_ids."""
    postings = (
        index.get_postings(list(weights))
        .select("term", "doc_id", wdt_col)
        .join(F.broadcast(candidates.select("doc_id").distinct()), "doc_id", "left_semi")
    )
    wqt_expr = None
    for t, w in weights.items():
        clause = (
            F.when(F.col("term") == t, F.lit(w))
            if wqt_expr is None
            else wqt_expr.when(F.col("term") == t, F.lit(w))
        )
        wqt_expr = clause
    return postings.withColumn("wqt", wqt_expr).groupBy("doc_id").agg(
        F.sum(F.col("wqt") * F.col(wdt_col)).alias("score")
    )


def ranked_search_wand(
    index: SparkIndex,
    raw_query: str,
    mode: str = "bm25",
    k: int = 10,
    oversample: int = 4,
    round_scores: int | None = None,
) -> DataFrame:
    """Block-max-pruned top-k; rank-identical to ranked_search (same scores,
    same tie-break by ascending doc_id)."""
    assert mode in ("bm25", "tfidf")
    terms = preprocess_ranked_query(raw_query)
    empty = index.spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty

    stats = index.term_stats_for(list(set(terms)))
    wqt_fn = bm25_wqt if mode == "bm25" else tfidf_wqt
    weights: dict[str, float] = {}
    for t in terms:
        if t in stats:
            weights[t] = weights.get(t, 0.0) + wqt_fn(index.n_docs, stats[t]["df"])
    if not weights:
        return empty

    max_col = "max_wdt_bm25" if mode == "bm25" else "max_wdt_tfidf_norm"
    wdt_col = "wdt_bm25" if mode == "bm25" else "wdt_tfidf_norm"
    gmax = {t: weights[t] * float(stats[t][max_col]) for t in weights}
    gmax_total = sum(gmax.values())

    # per-block upper bound: own term uses the block max, others their global
    # max — ub = wqt_t*max_wdt(B) + (gmax_total - gmax_t)
    blocks = index.segments.filter(F.col("term").isin(list(weights)))
    wqt_expr, rest_expr = None, None
    for t, w in weights.items():
        wqt_expr = (
            F.when(F.col("term") == t, F.lit(w))
            if wqt_expr is None
            else wqt_expr.when(F.col("term") == t, F.lit(w))
        )
        rest_expr = (
            F.when(F.col("term") == t, F.lit(gmax_total - gmax[t]))
            if rest_expr is None
            else rest_expr.when(F.col("term") == t, F.lit(gmax_total - gmax[t]))
        )
    blocks = blocks.withColumn("ub", wqt_expr * F.col(max_col) + rest_expr).persist()

    # pass 1: theta from the highest-ub blocks covering >= oversample*k postings
    target = oversample * k
    head = blocks.orderBy(F.desc("ub")).select("n_postings", "postings_bin").limit(64)
    head_rows, covered, seed_blobs = head.collect(), 0, []
    for r in head_rows:
        seed_blobs.append((bytearray(r["postings_bin"]),))
        covered += r["n_postings"]
        if covered >= target:
            break
    if not seed_blobs:
        blocks.unpersist()
        return empty
    seed_df = index.spark.createDataFrame(
        [(bytes(b[0]),) for b in seed_blobs], "postings_bin binary"
    )
    seed_ids = seed_df.mapInPandas(_decode_doc_ids, schema=_DOCIDS_SCHEMA)
    seed_scores = _exact_scores(index, weights, wdt_col, seed_ids).persist()
    kth = (
        seed_scores.orderBy(F.desc("score")).limit(k).orderBy(F.asc("score")).limit(1).collect()
    )
    n_seed = seed_scores.count()
    theta = float(kth[0]["score"]) if kth and n_seed >= k else float("-inf")

    # pass 2: prune, decode survivors, union candidates, exact score, top-k.
    # ub >= theta (not >) keeps docs that exactly tie the k-th score, so the
    # doc_id tie-break stays rank-identical to the exhaustive plan.
    survivors = blocks.filter(F.col("ub") >= theta).select("postings_bin")
    surv_ids = survivors.mapInPandas(_decode_doc_ids, schema=_DOCIDS_SCHEMA)
    candidates = surv_ids.unionByName(seed_scores.select("doc_id")).distinct()
    scored = _exact_scores(index, weights, wdt_col, candidates)
    if round_scores is not None:
        out = (
            scored.select("doc_id", F.round("score", round_scores).alias("score_r"))
            .orderBy(F.desc("score_r"), F.asc("doc_id"))
            .limit(k)
        )
    else:
        out = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rows = out.collect()
    seed_scores.unpersist()
    blocks.unpersist()
    return index.spark.createDataFrame(rows, out.schema)
