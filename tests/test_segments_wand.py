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


@pytest.mark.parametrize("mode", ["metadata", "seeded"])
def test_wand_theta_modes_rank_identical(spark_index, mode):
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.querying.wand import ranked_search_wand

    q = "the search engine"
    want = [(r["doc_id"], r["score"]) for r in ranked_search(spark_index, q, k=5).collect()]
    st: dict = {}
    got = [
        (r["doc_id"], r["score"])
        for r in ranked_search_wand(spark_index, q, k=5, theta_mode=mode, stats=st).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert st["blocks_total"] > 0 and st["blocks_decoded"] <= st["blocks_total"]
    assert st["bytes_decoded"] <= st["bytes_total"]


def test_wand_pruning_fires_on_skewed_corpus(spark, tmp_path):
    """A corpus where one tight cluster of docs repeats a term with high tf
    (high block max) and a long tail barely mentions it: k=1 with
    block-size-many hot docs forces low-ub tail blocks below theta, so the
    pruned plan decodes strictly fewer blocks — and stays rank-identical."""
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.indexing.index import SparkIndex
    from searchengine_spark.indexing.segments import BLOCK_SIZE
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.querying.wand import ranked_search_wand

    rows = []
    for i in range(3 * BLOCK_SIZE):
        if i < BLOCK_SIZE:  # a full block of hot docs
            text = " ".join(["zebra"] * 20 + ["filler", f"tok{i}"])
        else:  # long tail: one mention drowned in filler
            text = " ".join(["zebra"] + [f"pad{i}w{j}" for j in range(40)])
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "skew_index")
    build_index(spark, docs, out)
    index = SparkIndex(spark, out)

    want = [(r["doc_id"], round(r["score"], 9)) for r in ranked_search(index, "zebra", k=1).collect()]
    st: dict = {}
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in ranked_search_wand(index, "zebra", k=1, stats=st, min_blocks_to_prune=0).collect()
    ]
    assert got == want
    assert st["pruned"] is True
    assert 0 < st["blocks_decoded"] < st["blocks_total"]


def test_term_stats_from_blocks_matches_postings_scan(spark_index):
    """The dictionary (df, cf, weight maxima, block meta) aggregated from
    segment block rows must equal the legacy postings-table formulation —
    blocks partition each term's postings exactly, even when a term spans
    range partitions."""
    from searchengine_spark.indexing.build import term_stats_with_block_meta
    from searchengine_spark.indexing.logical import term_stats_table

    fast = {
        r["term"]: (r["df"], r["cf"], round(r["max_wdt_bm25"], 9), r["n_blocks"])
        for r in term_stats_with_block_meta(spark_index.segments).collect()
    }
    slow = {
        r["term"]: (r["df"], r["cf"], round(r["max_wdt_bm25"], 9))
        for r in term_stats_table(spark_index.postings).collect()
    }
    assert set(fast) == set(slow)
    for t, (df, cf, mx) in slow.items():
        assert fast[t][:3] == (df, cf, mx), t


def test_term_stats_legacy_segments_fallback(spark_index):
    """Segments written before the per-block sum_tf column existed must
    still yield a correct dictionary via the postings-table fallback."""
    import pytest

    from searchengine_spark.indexing.build import term_stats_with_block_meta

    legacy = spark_index.segments.drop("sum_tf")
    with pytest.raises(ValueError, match="legacy segments"):
        term_stats_with_block_meta(legacy)
    out = term_stats_with_block_meta(legacy, spark_index.postings)
    new = term_stats_with_block_meta(spark_index.segments)
    a = {r["term"]: (r["df"], r["cf"], r["n_blocks"]) for r in out.collect()}
    b = {r["term"]: (r["df"], r["cf"], r["n_blocks"]) for r in new.collect()}
    assert a == b
