"""Ranked retrieval (SURVEY.md §2 K1-K7): BM25 / tf-idf top-k as one
aggregate-and-take plan.

The reference scores term-at-a-time with O(df) point lookups per term
(rankedquery.py:18-49) — its documented slow path.  Here document weights
(wdt) were precomputed at build time into the postings table, so the query
plan is:

    postings[term in qterms]           (pushdown + row-group pruning)
      -> * wqt(term)                   (tiny literal CASE map, JVM-side)
      -> groupBy(doc_id).sum           (partial+final hash agg == the
                                        reference's accumulator dict)
      -> orderBy(score desc, doc_id).limit(k)   (TakeOrderedAndProject:
                                        per-partition heap + driver merge)

wqt is computed on the driver from a df lookup of just the query's terms —
the reference does the same dictionary lookup per term (rankedquery.py:10-16).
Query text is lower().split() only (rankedquery.py:55-57, SURVEY.md §8.Q1).
Ties break by ascending doc_id (deterministic; oracle matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.build import bm25_wqt, tfidf_wqt
from ..indexing.index import SparkIndex
from ..text import preprocess_ranked_query

# Single-stage plan cutoff: when the dictionary says the query's total df is
# below this, the pruned scan is coalesced to ONE partition — a single
# partition satisfies the aggregation's distribution requirement, so Catalyst
# plans scan -> complete hash agg -> TakeOrdered with NO exchange and no
# second stage.  Warm small-query latency is dominated by per-stage
# scheduling (two stages + an AQE re-plan), not by data; collapsing to one
# stage removes that floor.  Above the cutoff (hot terms at corpus scale)
# the distributed partial+final plan is kept — a 100M-posting term must not
# aggregate in one task.  The decision input is exact (df from the same
# dictionary lookup wqt already needs), not a guess.
SINGLE_STAGE_MAX_POSTINGS = 2_000_000


def ranked_search(
    index: SparkIndex,
    raw_query: str,
    mode: str = "bm25",
    k: int = 10,
    doc_filter: DataFrame | None = None,
    round_scores: int | None = None,
) -> DataFrame:
    """Returns DataFrame(doc_id, score) — top-k, score desc, doc_id asc.

    doc_filter: optional DataFrame(doc_id) — e.g. role/tool-filtered docs —
    applied as a semi-join before scoring (the transcript-schema extension:
    free-text queries over role='assistant' or tool='bash' subsets).

    round_scores: if set, emit (doc_id, score_r=round(score, n)) and order by
    the *rounded* score — makes the k-boundary deterministic across engines
    (used by the DuckDB correctness gate)."""
    assert mode in ("bm25", "tfidf")
    terms = preprocess_ranked_query(raw_query)
    if not terms:
        return index.spark.createDataFrame([], "doc_id long, score double")

    stats = index.term_stats_for(list(set(terms)))
    wqt_fn = bm25_wqt if mode == "bm25" else tfidf_wqt
    # duplicate query terms accumulate twice, exactly like the reference's
    # per-term loop (rankedquery.py:34-49)
    weights: dict[str, float] = {}
    for t in terms:
        if t in stats:
            weights[t] = weights.get(t, 0.0) + wqt_fn(index.n_docs, stats[t]["df"])
    if not weights:
        return index.spark.createDataFrame([], "doc_id long, score double")

    wdt_col = "wdt_bm25" if mode == "bm25" else "wdt_tfidf_norm"
    postings = index.get_postings(list(weights)).select("term", "doc_id", wdt_col)
    if doc_filter is not None:
        postings = postings.join(doc_filter.select("doc_id"), "doc_id", "left_semi")

    # wqt as a literal CASE map — stays in whole-stage codegen
    wqt_expr = None
    for t, w in weights.items():
        clause = F.when(F.col("term") == t, F.lit(w))
        wqt_expr = clause if wqt_expr is None else wqt_expr.when(F.col("term") == t, F.lit(w))
    scored = postings.withColumn("wqt", wqt_expr)
    total_df = sum(stats[t]["df"] for t in weights)
    if doc_filter is None and total_df <= SINGLE_STAGE_MAX_POSTINGS:
        scored = scored.coalesce(1)

    agg = scored.groupBy("doc_id").agg(F.sum(F.col("wqt") * F.col(wdt_col)).alias("score"))
    if round_scores is not None:
        return (
            agg.select("doc_id", F.round("score", round_scores).alias("score_r"))
            .orderBy(F.desc("score_r"), F.asc("doc_id"))
            .limit(k)
        )
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def role_tool_filter(index: SparkIndex, role: str | None = None, tool: str | None = None) -> DataFrame:
    """Predicate on doc_stats metadata columns -> DataFrame(doc_id)."""
    df = index.doc_stats
    if role is not None:
        df = df.filter(F.col("role") == role)
    if tool is not None:
        df = df.filter(F.col("tool") == tool)
    return df.select("doc_id")
