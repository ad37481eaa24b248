"""Round-4 ADVICE regression tests: sparse-docid weight fallback, resume
gate on both stats artifacts, RIFF-lookalike payloads in the bulk decode."""

import json
import os

import pytest


def test_doc_weight_arrays_rejects_sparse_ids(spark):
    """Density-contract guard: ids outside [0, n_docs) -> None (the caller
    then takes the enrichment-join path instead of mis-indexing)."""
    from searchengine_spark.indexing.build import doc_weight_arrays

    sparse = spark.createDataFrame(
        [(5, 3, 1.0), (900, 4, 2.0)], "doc_id long, doc_len long, l2_weight double"
    )
    assert doc_weight_arrays(sparse, n_docs=10) is None
    dense = spark.createDataFrame(
        [(0, 3, 1.0), (1, 4, 2.0)], "doc_id long, doc_len long, l2_weight double"
    )
    assert doc_weight_arrays(dense, n_docs=2) is not None


def test_build_over_sparse_doc_ids_correct_weights(spark, tmp_path):
    """A filtered corpus (sparse surviving doc_ids) fed straight to
    build_index must produce the same BM25 weights as the same docs re-idded
    densely — the broadcast-array fast path must decline, not mis-index."""
    from searchengine_spark.indexing.build import build_index

    texts = [(i, f"alpha beta tok{i % 5} gamma delta") for i in range(0, 300, 7)]
    sparse = spark.createDataFrame(texts, "doc_id long, text string")
    out_sparse = str(tmp_path / "sparse")
    build_index(spark, sparse, out_sparse)

    remap = {doc_id: new for new, (doc_id, _) in enumerate(texts)}
    dense = spark.createDataFrame(
        [(remap[d], t) for d, t in texts], "doc_id long, text string"
    )
    out_dense = str(tmp_path / "dense")
    build_index(spark, dense, out_dense)

    def weights(path, idmap=None):
        rows = spark.read.parquet(os.path.join(path, "postings")).collect()
        return {
            (r["term"], idmap[r["doc_id"]] if idmap else r["doc_id"]): round(r["wdt_bm25"], 12)
            for r in rows
        }

    assert weights(out_sparse, remap) == weights(out_dense)


def test_resume_recomputes_when_corpus_stats_missing(spark, tmp_path):
    """Pre-change manifest shape: doc_stats marked done, corpus_stats never
    written — resume must recompute the stats phase, not AnalysisException."""
    import shutil

    from searchengine_spark.indexing.build import build_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 7}") for i in range(100)], "doc_id long, text string"
    )
    out = str(tmp_path / "idx")
    build_index(spark, docs, out)
    # simulate the crash window: corpus_stats artifact gone, manifest entry
    # gone, doc_stats still marked done
    shutil.rmtree(os.path.join(out, "corpus_stats"))
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    manifest["stages"].pop("corpus_stats", None)
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    m = build_index(spark, docs, out, resume=True)
    assert os.path.exists(os.path.join(out, "corpus_stats", "_SUCCESS"))
    assert m["metrics"]["n_docs"] == 100


def test_decode_meta_riff_lookalike_text_is_unknown(spark):
    """A transcript that happens to start 'RIFF....WAVE' is not a WAV: the
    bulk decode must fall through to format='unknown', not crash the query."""
    from searchengine_spark.pipeline.multimodal import decode_media, decode_meta

    payload = b"RIFF0000WAVEform follows but this is just text, no fmt chunk"
    with pytest.raises(ValueError):
        decode_media(payload)  # standalone API stays loud

    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = decode_meta(df).collect()
    assert rows[0]["format"] == "unknown"


def test_decode_media_truncated_fmt_chunk_no_struct_error(spark):
    """fmt chunk header present but payload truncated before off+24: the
    bound check must skip it (-> ValueError for missing fmt), not struct.error."""
    from searchengine_spark.pipeline.multimodal import decode_media

    truncated = b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01"
    with pytest.raises(ValueError):
        decode_media(truncated)
