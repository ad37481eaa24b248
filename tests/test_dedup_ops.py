"""Dedup / similarity / multimodal / spelling op semantics (training-data
pipeline family).  The exact Spark-vs-DuckDB value gate is
tools/check_gate.py; these are targeted property checks."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
        (3, "completely different text about spark shuffle partitions"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_exact_and_near_dups(docs):
    from searchengine_spark.pipeline import dedup_minhash

    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash(docs).collect()}
    assert (0, 1) in pairs  # identical texts always collide in every band
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_identical_texts_equal(docs):
    from searchengine_spark.pipeline import simhash

    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h[0] == h[1]
    assert 0 <= h[0] < 2**32
    # near-dup hamming distance small, unrelated large
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(h[0], h[2]) < ham(h[0], h[3])


def test_ngram_jaccard_scores(docs):
    from searchengine_spark.pipeline import ngram_jaccard_pairs

    rows = {(r["doc_a"], r["doc_b"]): r["jaccard_r"] for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert rows[(0, 1)] == 1.0  # identical -> jaccard exactly 1
    assert 0.3 <= rows[(0, 2)] < 1.0  # near dup in between
    assert (0, 3) not in rows


def test_near_dup_embedding_pairs(spark):
    from searchengine_spark.pipeline import near_dup_embedding

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),  # ~same direction
            (2, [0.0, 1.0, 0.0]),  # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["vec_a"], r["vec_b"]) for r in near_dup_embedding(emb, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_near_dup_lsh_subset_of_exact_and_no_nested_loop(spark):
    """LSH candidates are a subset of the exact all-pairs result (same
    rescoring, pruned pair space), nearly-identical vectors always collide,
    and the plan contains no cartesian/BroadcastNestedLoopJoin — the
    scale-shape guarantee."""
    from searchengine_spark.pipeline import near_dup_embedding, near_dup_embedding_exact

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim_r"]
        for r in near_dup_embedding_exact(emb, threshold=0.4).collect()
    }
    lsh_df = near_dup_embedding(emb, threshold=0.4, n_planes=4, n_tables=8, seed=42)
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    lsh = {(r["vec_a"], r["vec_b"]): r["sim_r"] for r in lsh_df.collect()}
    assert set(lsh) <= set(exact)
    for pair, sim in lsh.items():
        assert exact[pair] == sim  # rescore is exact within candidates


def test_simhash_kernel_matches_expression(spark):
    from searchengine_spark.pipeline import simhash, simhash_kernel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expr = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    kern = {r["doc_id"]: r["simhash"] for r in simhash_kernel(docs, bits=32).collect()}
    assert kern == expr


def test_multimodal_meta_plumbing(docs):
    import hashlib

    from searchengine_spark.pipeline import multimodal_meta

    out = {r["doc_id"]: r for r in multimodal_meta(docs).collect()}
    want = "the quick brown fox jumps over the lazy dog".encode()
    assert out[0]["n_bytes"] == len(want)
    assert out[0]["payload_md5"] == hashlib.md5(want).hexdigest()
    assert 1 <= out[0]["width"] <= 640 and 1 <= out[0]["height"] <= 480


def test_decode_media_parses_png_and_wav():
    from searchengine_spark.pipeline.multimodal import decode_media, make_png, make_wav

    png = decode_media(make_png(320, 200, b"pixels"))
    assert (png["format"], png["width"], png["height"], png["n_frames"]) == ("png", 320, 200, 1)
    assert png["sample_rate"] is None

    wav = decode_media(make_wav(16000, 2, b"0123456789ab"))
    assert (wav["format"], wav["sample_rate"]) == ("wav", 16000)
    assert wav["n_frames"] == 12 // 4  # 12 data bytes / (2 ch * 2 bytes)
    assert wav["width"] is None and wav["height"] is None

    assert decode_media(b"plain text payload") is None  # unrecognized -> fake path

    # recognized signature with malformed layout fails loudly
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\nnot-an-ihdr-chunk-here....")
    with pytest.raises(ValueError):
        decode_media(b"RIFF\x04\x00\x00\x00WAVE")


def test_multimodal_decode_round_trip(spark, docs):
    # synthesized container bytes parse back to the injected values
    from searchengine_spark.pipeline import multimodal_decode

    out = {r["doc_id"]: r for r in multimodal_decode(docs).collect()}
    for d, r in out.items():
        if d % 3 == 0:
            assert r["format"] == "png"
            assert (r["width"], r["height"]) == (1 + d % 640, 1 + d % 480)
        elif d % 3 == 1:
            assert r["format"] == "wav"
            assert r["sample_rate"] == 8000 * (1 + d % 6)
        else:
            assert r["format"] == "unknown"


def test_spell_suggestions(spark):
    from searchengine_spark.text.spelling import spell_suggestions

    vocab = spark.createDataFrame(
        [("search",), ("searching",), ("query",), ("quick",), ("document",), ("documents",)],
        "term string",
    )
    rows = spell_suggestions(vocab, ["serch", "qury"], top_n=3).collect()
    by_word = {}
    for r in rows:
        by_word.setdefault(r["word"], []).append((r["rnk"], r["term"], r["dist"]))
    assert sorted(by_word["serch"])[0][1] == "search"  # nearest suggestion first
    assert sorted(by_word["qury"])[0][1] == "query"
    assert all(len(v) == 3 for v in by_word.values())


def test_lsh_approximates_exact_topk(spark):
    """LSH is approximate: every returned neighbor must carry its true
    brute-force similarity (re-rank is exact within the candidate set) and
    recall@5 for this fixed seed is deterministic (>= 3/5 on the testdata
    table, whose vectors are near-orthogonal — the hard case for LSH).
    The driver gate separately checks exact equality against the identical
    LSH algorithm in SQL (sql_lsh_topk)."""
    from searchengine_spark.pipeline import cosine_topk, lsh_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r["vec_id"]: r["sim_r"] for r in cosine_topk(emb, 0, k=50).collect()}
    top5 = list(exact)[:5]
    approx = [(r["vec_id"], r["sim_r"]) for r in lsh_cosine_topk(emb, 0, k=5, n_planes=4, n_tables=8).collect()]
    for vec_id, sim in approx:
        assert exact.get(vec_id) == sim  # candidate sims are exact
    assert len({v for v, _ in approx} & set(top5)) >= 3  # deterministic recall
