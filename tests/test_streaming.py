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


def _mk_turns(spark, conv_start, n_convs, words_per_turn=6, tag=""):
    """Deterministic transcript frame: every turn has the same token count,
    so avgdl is invariant across epochs (drift = 0)."""
    import datetime

    from searchengine_spark.data import spark_schema

    rows = []
    for c in range(conv_start, conv_start + n_convs):
        for t in range(3):
            text = " ".join(f"tok{(c * 7 + t * 3 + w) % 23}" for w in range(words_per_turn))
            rows.append(
                (f"conv{c:05d}", t, "user", text, "", datetime.datetime(2026, 1, 1))
            )
    return spark.createDataFrame(rows, schema=spark_schema())


def _part_files(path):
    return {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }


def test_incremental_compact_touches_only_delta(tmp_path_factory, spark):
    """Round-4: compact() after a small epoch appends O(delta) files — the
    existing postings/segments part files are byte-for-byte untouched — and
    the result is identical to a full rebuild over all turns (avgdl is
    engineered invariant, so the pinned-weight path is exact)."""
    from searchengine_spark.indexing import SparkIndex, build_index, prepare_transcripts
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("incr_index"))
    indexer = StreamingIndexer(spark, out, n_partitions=4)
    indexer.process_batch(_mk_turns(spark, 0, 40), epoch_id=0)
    indexer.compact()

    postings_dir = os.path.join(out, "postings")
    segments_dir = os.path.join(out, "segments")
    before_postings = _part_files(postings_dir)
    before_segments = _part_files(segments_dir)

    indexer.process_batch(_mk_turns(spark, 40, 5), epoch_id=1)
    m = indexer.compact()  # incremental: avgdl unchanged
    assert m["metrics"]["avgdl_weights"] == m["metrics"]["avgdl"]

    after_postings = _part_files(postings_dir)
    after_segments = _part_files(segments_dir)
    for f, mtime in before_postings.items():
        assert after_postings.get(f) == mtime, f"old postings file rewritten: {f}"
    for f, mtime in before_segments.items():
        assert after_segments.get(f) == mtime, f"old segments file rewritten: {f}"
    assert len(after_postings) > len(before_postings)  # delta appended

    # equivalence to a full batch rebuild over the same 45 conversations
    batch_out = str(tmp_path_factory.mktemp("incr_batch"))
    all_turns = _mk_turns(spark, 0, 45)
    build_index(spark, prepare_transcripts(all_turns), batch_out)
    streamed, batch = SparkIndex(spark, out), SparkIndex(spark, batch_out)
    assert streamed.n_docs == batch.n_docs
    assert streamed.total_tokens == batch.total_tokens
    for query in ("tok1 tok5 tok9", "tok20 tok3"):
        a = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(streamed, query, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(batch, query, k=10).collect()]
        assert a == b, query
    # merged dictionary == batch dictionary (semantic columns)
    s = {tuple(r) for r in spark.read.parquet(os.path.join(out, "term_stats")).select("term", "df", "cf").collect()}
    b = {tuple(r) for r in spark.read.parquet(os.path.join(batch_out, "term_stats")).select("term", "df", "cf").collect()}
    assert s == b


def test_incremental_compact_falls_back_on_avgdl_drift(tmp_path_factory, spark):
    """An epoch that moves avgdl beyond the tolerance triggers a full
    recompaction with the fresh avgdl (weights exact again)."""
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("drift_index"))
    indexer = StreamingIndexer(spark, out, n_partitions=4)
    indexer.process_batch(_mk_turns(spark, 0, 10, words_per_turn=4), epoch_id=0)
    indexer.compact()
    postings_dir = os.path.join(out, "postings")
    before = _part_files(postings_dir)

    # 3x longer docs: avgdl moves far beyond 5%
    indexer.process_batch(_mk_turns(spark, 10, 10, words_per_turn=12), epoch_id=1)
    m = indexer.compact(avgdl_tolerance=0.05)
    assert m["metrics"]["avgdl_weights"] == m["metrics"]["avgdl"]  # full rebuild
    after = _part_files(postings_dir)
    assert set(after) != set(before)  # rewritten, not appended


def test_tier_merge_bounds_small_files(tmp_path_factory, spark):
    """Round-5: dozens of ingest+incremental-compact epochs keep every
    artifact's parquet file count BOUNDED (the LSM-style delta-tier merge,
    round-4 verdict finding #3) while the merged index stays content- and
    rank-identical to a full recompaction over the same retained deltas."""
    import shutil

    import pandas as pd

    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("merge_index"))
    threshold = 12
    indexer = StreamingIndexer(spark, out, n_partitions=4, max_artifact_files=threshold)
    indexer.process_batch(_mk_turns(spark, 0, 20), epoch_id=0)
    indexer.compact()  # full compact -> main tier recorded

    main_files = max(
        len(indexer._list_parquet(a)) for a in indexer._MERGE_ARTIFACTS
    )
    bound = max(threshold, main_files) + 3 * 4  # threshold + one compact's appends
    for e in range(1, 36):
        indexer.process_batch(_mk_turns(spark, 20 + e * 2, 2), epoch_id=e)
        indexer.compact()
        counts = {a: len(indexer._list_parquet(a)) for a in indexer._MERGE_ARTIFACTS}
        assert max(counts.values()) <= bound, (e, counts)
    m = indexer._manifest()
    assert int(m.get("merge_seq", 0)) >= 2, "expected multiple tier merges"
    assert not m.get("merge_journal")

    # content parity vs a FULL recompaction over the same deltas
    clone = str(tmp_path_factory.mktemp("merge_full"))
    shutil.copytree(out, clone, dirs_exist_ok=True)
    full = StreamingIndexer(spark, clone, n_partitions=4)
    full._compact_full(full._manifest())

    a, b = SparkIndex(spark, out), SparkIndex(spark, clone)
    assert a.n_docs == b.n_docs and a.total_tokens == b.total_tokens
    cols = ["term", "doc_id", "tf", "positions", "wdt_bm25", "wdt_tfidf_norm"]
    pa = a.postings.select(cols).toPandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    pb = b.postings.select(cols).toPandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    pa["positions"] = pa["positions"].map(tuple)
    pb["positions"] = pb["positions"].map(tuple)
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)
    for q in ("tok1 tok5 tok9", "tok3"):
        ra = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(a, q, k=10).collect()]
        rb = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(b, q, k=10).collect()]
        assert ra == rb and ra, q


def test_tier_merge_journal_replay_completes_crashed_swap(tmp_path_factory, spark):
    """A merge that crashes between staging and the file swap leaves a
    journal; the next compact() replays it to completion (no lost or
    doubled postings)."""
    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("journal_index"))
    indexer = StreamingIndexer(spark, out, n_partitions=4, max_artifact_files=1)
    indexer.process_batch(_mk_turns(spark, 0, 10), epoch_id=0)
    indexer.compact()

    # crash injection: staging + journal write succeed, the swap "crashes"
    orig_apply = indexer._apply_merge_journal
    indexer._apply_merge_journal = lambda m: (_ for _ in ()).throw(
        RuntimeError("simulated crash mid-merge")
    )
    indexer.process_batch(_mk_turns(spark, 10, 2), epoch_id=1)
    try:
        indexer.compact()
        raise AssertionError("crash injection did not fire")
    except RuntimeError:
        pass
    assert indexer._manifest().get("merge_journal"), "journal not durable"

    indexer._apply_merge_journal = orig_apply
    indexer.process_batch(_mk_turns(spark, 12, 2), epoch_id=2)
    indexer.compact()  # replays the journal first
    m = indexer._manifest()
    assert not m.get("merge_journal")

    idx = SparkIndex(spark, out)
    assert idx.n_docs == (10 + 2 + 2) * 3
    # no doubled postings: every (term, doc_id) unique
    n = idx.postings.count()
    assert idx.postings.select("term", "doc_id").distinct().count() == n
    assert ranked_search(idx, "tok1 tok5", k=5).count() > 0
