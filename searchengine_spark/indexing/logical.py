"""Logical-plan building blocks shared by the persisted index build
(build.py) and the index-free engine (engine_api.py).

Everything here is a pure DataFrame -> DataFrame function; Catalyst sees one
composed plan either way.  Semantics cites are in build.py / SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def postings_all_table(tokens: DataFrame) -> DataFrame:
    """B1: (term, doc_id) -> tf + sorted positions (duplicates kept — hyphen
    variants that clean to the same term share a position)."""
    return tokens.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("position")).alias("positions"),
    )


def doc_stats_table(postings_all: DataFrame) -> DataFrame:
    """B5/B6: doc_len counts emitted terms *including* empty ones; L_d
    includes the empty term's tf (spimi.py:74-123)."""
    return postings_all.groupBy("doc_id").agg(
        F.sum("tf").alias("doc_len"),
        F.sqrt(F.sum(F.pow(F.lit(1.0) + F.log("tf"), 2))).alias("l2_weight"),
    )


def corpus_stats_table(doc_stats: DataFrame) -> DataFrame:
    return doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_len").alias("total_tokens"),
    ).withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))


def weighted_postings_table(postings_all: DataFrame, doc_stats: DataFrame, avgdl: float) -> DataFrame:
    """K3/K4 precomputation; the empty term is excluded from the index
    (spimi.py:137)."""
    return (
        postings_all.filter(F.col("term") != "")
        .join(doc_stats.select("doc_id", "doc_len", "l2_weight"), "doc_id")
        .withColumn(
            "wdt_bm25",
            (F.lit(BM25_K1 + 1.0) * F.col("tf"))
            / (
                F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("doc_len") / F.lit(avgdl)))
                + F.col("tf")
            ),
        )
        .withColumn("wdt_tfidf_norm", (F.lit(1.0) + F.log("tf")) / F.col("l2_weight"))
        .drop("doc_len", "l2_weight")
    )


def term_stats_table(postings: DataFrame) -> DataFrame:
    """B7 + block-max metadata."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max("wdt_bm25").alias("max_wdt_bm25"),
        F.max("wdt_tfidf_norm").alias("max_wdt_tfidf_norm"),
    )
