"""Structured-Streaming ingest + compaction: the streamed-then-compacted
index must answer queries rank-identically to a batch build over the same
turns (files arrive in corpus order, so docIDs coincide)."""

import os

import pytest


@pytest.fixture(scope="module")
def stream_setup(tmp_path_factory, spark, turns):
    from searchengine_spark.data import spark_schema, turns_as_rows

    src = tmp_path_factory.mktemp("stream_src")
    ordered = sorted(turns, key=lambda t: (t.conv_id, t.turn_idx))
    half = len(ordered) // 2
    # split on a conversation boundary so arrival order == corpus order
    while half < len(ordered) and ordered[half].turn_idx != 0:
        half += 1
    for i, chunk in enumerate((ordered[:half], ordered[half:])):
        df = spark.createDataFrame(turns_as_rows(chunk), schema=spark_schema())
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"part{i}.parquet"))
    return str(src)


def test_stream_ingest_compact_matches_batch(tmp_path_factory, spark, stream_setup, index_dir):
    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("stream_index"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    indexer = StreamingIndexer(spark, out, n_partitions=8)
    q = indexer.start(stream_setup + "/*/", ckpt, available_now=True)
    q.awaitTermination(300)

    m = indexer._manifest()
    assert m["epochs"], "no epochs processed"
    indexer.compact()

    streamed = SparkIndex(spark, out)
    batch = SparkIndex(spark, index_dir)
    assert streamed.n_docs == batch.n_docs
    assert streamed.total_tokens == batch.total_tokens

    for query in ("quick fox jump", "the search engine", "index"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(streamed, query, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(batch, query, k=10).collect()]
        assert a == b, f"streamed vs batch mismatch for {query!r}"


def test_epoch_retry_is_idempotent(tmp_path_factory, spark, turns):
    from searchengine_spark.data import spark_schema, turns_as_rows
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("retry_index"))
    indexer = StreamingIndexer(spark, out, n_partitions=4)
    df = spark.createDataFrame(turns_as_rows(turns[:50]), schema=spark_schema())
    indexer.process_batch(df, epoch_id=0)
    first = indexer._manifest()
    indexer.process_batch(df, epoch_id=0)  # sink retry
    assert indexer._manifest() == first  # no double-count


def test_compact_ignores_uncommitted_epoch_dirs(tmp_path_factory, spark, turns):
    """An epoch directory with parquet but no manifest entry (crash between
    write and _save) must be excluded by compact() — only manifest-committed
    epochs participate, so the doc_id watermark stays truthful."""
    from searchengine_spark.data import spark_schema, turns_as_rows
    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("orphan_index"))
    indexer = StreamingIndexer(spark, out, n_partitions=4)
    df = spark.createDataFrame(turns_as_rows(turns[:40]), schema=spark_schema())
    indexer.process_batch(df, epoch_id=0)
    committed_docs = indexer._manifest()["next_doc_id"]

    # simulate a crashed epoch 1: parquet written, manifest never updated
    orphan = spark.createDataFrame(turns_as_rows(turns[40:60]), schema=spark_schema())
    indexer.process_batch(orphan, epoch_id=1)
    m = indexer._manifest()
    del m["epochs"]["1"]
    m["next_doc_id"] = committed_docs
    indexer._save(m)

    indexer.compact()
    idx = SparkIndex(spark, out)
    assert idx.n_docs == committed_docs  # orphan epoch not merged
    max_doc = idx.doc_stats.agg({"doc_id": "max"}).collect()[0][0]
    assert max_doc < committed_docs
