"""Training-data pipeline ops: dedup, similarity search, text analysis."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_dedup_exact_finds_duplicates(spark):
    from searchengine_spark.pipeline import dedup_exact

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "unique text"), (3, "a b c")],
        "doc_id long, text string",
    )
    rows = {r["doc_md5"]: (r["keep_doc_id"], r["n_copies"]) for r in dedup_exact(docs).collect()}
    assert len(rows) == 2
    assert (0, 3) in rows.values()
    assert (2, 1) in rows.values()


def test_cosine_topk_self_excluded_and_ordered(spark, embeddings):
    from searchengine_spark.pipeline import cosine_topk

    rows = cosine_topk(embeddings, 0, k=10).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] != 0 for r in rows)
    sims = [r["sim_r"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_tradeoff(spark, embeddings):
    from searchengine_spark.pipeline import cosine_topk, lsh_cosine_topk

    bf = {r["vec_id"] for r in cosine_topk(embeddings, 0, k=10).collect()}
    lsh = {r["vec_id"] for r in lsh_cosine_topk(embeddings, 0, k=10, n_planes=4, n_tables=16).collect()}
    # near-random vectors: (1-theta/pi)^4 per table, 16 tables -> ~0.8 expected
    assert len(bf & lsh) / 10 >= 0.6


def test_lsh_exactness_within_candidates(spark, embeddings):
    # every LSH result must carry the same rounded sim as brute force gives it
    from searchengine_spark.pipeline import cosine_topk, lsh_cosine_topk

    bf = {r["vec_id"]: r["sim_r"] for r in cosine_topk(embeddings, 0, k=500).collect()}
    for r in lsh_cosine_topk(embeddings, 0, k=10).collect():
        assert bf[r["vec_id"]] == r["sim_r"]


def test_lang_id_marker_rule(spark):
    from searchengine_spark.pipeline import lang_id

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog"),
            (1, "el gato de la casa"),
            (2, "der hund und die katze"),
            (3, "xyz qqq zzz"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "unknown"}


def test_fingerprint_whitespace_invariant(spark):
    from searchengine_spark.pipeline import fingerprint

    docs = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world "), (2, "different")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_token_count(spark):
    from searchengine_spark.pipeline import token_count

    docs = spark.createDataFrame([(0, "a b  c d-e f.g")], "doc_id long, text string")
    r = token_count(docs).collect()[0]
    assert r["n_ws_tokens"] == 5  # double space collapses
    assert r["n_alnum_tokens"] == 7  # d, e split; f, g split


def test_signature_kernel_matches_expression(spark, embeddings):
    """The numpy signature kernel's strict left-to-right dot accumulation is
    bit-identical to the interpreted expression fold — bucket ids (sign
    decisions on the same float64 values) must match exactly."""
    from searchengine_spark.pipeline.similarity import (
        hyperplane_signatures,
        hyperplane_signatures_expr,
    )

    a = sorted(tuple(r) for r in hyperplane_signatures(embeddings, 4, 8, 42).drop("embedding").collect())
    b = sorted(tuple(r) for r in hyperplane_signatures_expr(embeddings, 4, 8, 42).drop("embedding").collect())
    assert a == b


def test_lsh_index_materialized_matches_one_shot(spark, embeddings):
    from searchengine_spark.pipeline import LshIndex, lsh_cosine_topk

    idx = LshIndex(embeddings, n_planes=4, n_tables=8, seed=42)
    try:
        for q in (0, 7):
            a = [tuple(r) for r in idx.topk(q, k=5).collect()]
            b = [tuple(r) for r in lsh_cosine_topk(embeddings, q, k=5, n_planes=4, n_tables=8, seed=42).collect()]
            assert a == b
    finally:
        idx.unpersist()


def test_auto_n_planes_bounds_bucket_occupancy(spark):
    """Round-4 scale fix: n_planes defaults to auto_n_planes(N), so growing
    the corpus 10x must NOT grow expected bucket occupancy — the per-bucket
    kernels do O(occupancy^2) pair work."""
    import numpy as np

    from searchengine_spark.pipeline.similarity import (
        auto_n_planes,
        hyperplane_signatures,
    )

    # analytic property of the sizing rule itself
    for n in (100, 1_000, 10_000, 1_000_000, 100_000_000):
        assert n / 2 ** auto_n_planes(n) <= 2 * 64  # target occupancy 64

    # measured property on real (deterministic) vectors: occupancy at 10x
    # the corpus with auto planes stays within ~2x of the small-corpus
    # occupancy, instead of growing ~10x at fixed planes
    rng = np.random.RandomState(7)

    def occupancy(n):
        vecs = [(i, [float(v) for v in rng.randn(16)]) for i in range(n)]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        signed = hyperplane_signatures(emb, n_planes=auto_n_planes(n), n_tables=1, seed=42)
        sizes = [r["c"] for r in signed.groupBy("bucket_0").agg(F.count("*").alias("c")).collect()]
        return sum(sizes) / len(sizes)

    occ_small, occ_big = occupancy(400), occupancy(4000)
    assert occ_big <= 2.5 * occ_small, (occ_small, occ_big)
