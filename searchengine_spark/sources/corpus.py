"""File-corpus sources (SURVEY.md §2 S1-S3).

The reference walks a directory, dispatches on extension, and assigns dense
sequential docIDs in traversal order (reference:
engine/documents/directorycorpus.py:64-79).  Spark-first equivalents:

  * .txt  -> ``spark.read.text(..., wholetext=True)`` — one row per file,
            title = filename stem (textfiledocument.py:12-25);
  * .json -> ``spark.read.json`` with ``title`` / ``body`` keys
            (directorycorpus.py:69-74, jsondocument.py:6-25);
  * .xml  -> out of scope for v1 (no XML in the input_hint; would be
            spark-xml or mapInPandas+lxml — xmldocument.py:25-52).

DocID density: the reference's "filesystem traversal order" is replicated
deterministically as ORDER BY file path (rglob order is platform-dependent;
path sort is the stable contract, same trick as the transcript table's
(conv_id, turn_idx) ordering).  The output (doc_id, title, text) feeds the
same build pipeline as transcripts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.build import assign_doc_ids


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(path, title, text): one doc per .txt file; title = stem."""
    raw = spark.read.text(f"{path}/*.txt", wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    stem = F.regexp_replace(F.element_at(F.split(F.col("path"), "/"), -1), r"\.txt$", "")
    return raw.select("path", stem.alias("title"), "text")


def read_json_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(path, title, text) from {"title": ..., "body": ...} JSON files."""
    raw = spark.read.json(f"{path}/*.json").withColumn("path", F.input_file_name())
    return raw.select("path", F.col("title"), F.col("body").alias("text"))


def read_directory_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched union with dense docIDs in path order —
    the DirectoryCorpus contract.  Returns (doc_id, title, text)."""
    parts = []
    try:
        parts.append(read_text_corpus(spark, path))
    except Exception:
        pass
    try:
        parts.append(read_json_corpus(spark, path))
    except Exception:
        pass
    if not parts:
        raise ValueError(f"no .txt or .json documents under {path}")
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    with_ids = assign_doc_ids(corpus, order_cols=("path",))
    return with_ids.select("doc_id", "title", "text")
