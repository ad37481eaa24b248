"""Compressed segment layer + block-max WAND (SURVEY.md §7 Phase 2/4).

The blob layer must be lossless (decode == logical postings) and the WAND
path rank-identical to the exhaustive ranked plan.
"""

import pytest


def test_segments_lossless(spark_index):
    from searchengine_spark.indexing.segments import decode_segments

    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in decode_segments(spark_index.segments).collect()
    }
    want = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in spark_index.postings.collect()
    }
    assert got == want


def test_segment_block_invariants(spark_index):
    from searchengine_spark.indexing.segments import BLOCK_SIZE

    rows = spark_index.segments.collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_postings"] <= BLOCK_SIZE
        assert r["doc_id_min"] <= r["doc_id_max"]
        assert r["max_wdt_bm25"] > 0


def test_segment_metrics_in_manifest(spark_index):
    m = spark_index.manifest["metrics"]
    assert m["n_segment_blocks"] > 0
    assert m["segment_bytes_compressed"] > 0
    # varbyte must beat the reference's fixed u32 layout: logical stream is
    # (1 + 2*postings + positions) values -> 4 bytes each uncompressed
    n_vals = 1 * m["n_segment_blocks"] + 2 * m["n_postings"] + m["total_tokens"]
    assert m["segment_bytes_compressed"] < 4 * n_vals


WAND_QUERIES = [
    "quick fox jump",
    "the search engine",
    "index",
    "tool bash error",
    "spark shuffle partition merge",
]


@pytest.mark.parametrize("query", WAND_QUERIES)
@pytest.mark.parametrize("mode", ["bm25", "tfidf"])
def test_wand_rank_identical(spark_index, query, mode):
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.querying.wand import ranked_search_wand

    want = [(r["doc_id"], r["score"]) for r in ranked_search(spark_index, query, mode=mode, k=10).collect()]
    got = [(r["doc_id"], r["score"]) for r in ranked_search_wand(spark_index, query, mode=mode, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_wand_unknown_terms(spark_index):
    from searchengine_spark.querying.wand import ranked_search_wand

    assert ranked_search_wand(spark_index, "zzzqx notinvocab", k=5).count() == 0
