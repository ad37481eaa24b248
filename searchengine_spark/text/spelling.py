"""Spelling correction (SURVEY.md §2 T10).

The reference scans the full vocabulary computing Levenshtein distance per
query word and keeps the 5 nearest (reference:
engine/text/spellingcorrection.py:8-38; dead at runtime — call site commented
out, interface/model.py:122-127 — but part of the engine's capability
surface).

Spark-first: the query-word list is tiny, so it is broadcast against the
distinct-term vocabulary and ranked with a per-word window — one scan of the
vocab, built-in levenshtein(), no Python.  At 10^12-turn scale the vocab is
still only O(10^7) terms, so this stays a single narrow stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spell_suggestions(vocab: DataFrame, words: list[str], top_n: int = 5) -> DataFrame:
    """vocab: DataFrame with a ``term`` column (distinct terms).
    Returns (word, term, dist, rnk) — top_n nearest vocabulary terms per
    query word; ties broken lexicographically (deterministic)."""
    spark = vocab.sparkSession
    qdf = spark.createDataFrame([(w,) for w in words], "word string")
    d = vocab.select("term").distinct().join(F.broadcast(qdf)).withColumn(
        "dist", F.levenshtein(F.col("word"), F.col("term"))
    )
    w = Window.partitionBy("word").orderBy(F.asc("dist"), F.asc("term"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("word", "term", "dist", "rnk")
    )
