"""Persisted LSH embedding index (pipeline/embedding_index.py): the
at-ingest bucket-materialization path must reproduce the in-session
signature path exactly, survive a read-back, and lay the artifact out so
bucket probes prune."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def eindex(spark, embeddings, tmp_path_factory):
    from searchengine_spark.pipeline import build_embedding_index

    out = str(tmp_path_factory.mktemp("eindex"))
    return build_embedding_index(spark, embeddings, out, n_planes=4, n_tables=8, seed=42)


def test_manifest_records_parameters(eindex, embeddings):
    m = eindex.manifest
    assert (m["n_planes"], m["n_tables"], m["seed"]) == (4, 8, 42)
    assert m["dim"] == 64
    assert m["n_vectors"] == embeddings.count()


def test_near_dups_match_in_session_path(spark, embeddings, eindex):
    from searchengine_spark.pipeline import near_dup_embedding

    live = {
        (r["vec_a"], r["vec_b"]): r["sim_r"]
        for r in near_dup_embedding(
            embeddings, threshold=0.4, n_planes=4, n_tables=8, seed=42
        ).collect()
    }
    persisted = {
        (r["vec_a"], r["vec_b"]): r["sim_r"]
        for r in eindex.near_dups(threshold=0.4).collect()
    }
    assert live == persisted
    assert persisted  # non-vacuous at sf0.001


def test_topk_matches_in_session_path(spark, embeddings, eindex):
    from searchengine_spark.pipeline import lsh_cosine_topk

    live = [
        (r["vec_id"], r["sim_r"])
        for r in lsh_cosine_topk(
            embeddings, query_vec_id=0, k=10, n_planes=4, n_tables=8, seed=42
        ).collect()
    ]
    persisted = [(r["vec_id"], r["sim_r"]) for r in eindex.topk(0, k=10).collect()]
    assert live == persisted


def test_reload_round_trip(spark, eindex):
    from searchengine_spark.pipeline import EmbeddingIndex

    reloaded = EmbeddingIndex(spark, eindex.path)
    a = sorted(eindex.topk(3, k=5).collect())
    b = sorted(reloaded.topk(3, k=5).collect())
    assert a == b


def test_bucket_probe_is_pushed_to_parquet(eindex):
    # the layout story: a bucket_0 probe must reach the scan as a pushed
    # filter over the range-partitioned/sorted artifact (row-group pruning)
    probe = eindex.signed.filter(F.col("bucket_0") == 3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "bucket_0" in plan, plan


def test_mismatched_artifact_rejected(spark, eindex, tmp_path):
    from searchengine_spark.pipeline import EmbeddingIndex
    from searchengine_spark.pipeline.embedding_index import MANIFEST, SIGNATURES

    bad = tmp_path / "bad_index"
    os.makedirs(bad)
    # manifest claims more tables than the signature frame carries
    m = dict(eindex.manifest)
    m["n_tables"] = 32
    with open(bad / MANIFEST, "w") as f:
        json.dump(m, f)
    os.symlink(
        os.path.join(eindex.path, SIGNATURES), bad / SIGNATURES, target_is_directory=True
    )
    with pytest.raises(ValueError, match="missing columns"):
        EmbeddingIndex(spark, str(bad))
