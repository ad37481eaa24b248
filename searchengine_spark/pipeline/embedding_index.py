"""Persisted LSH embedding index: bucket columns materialized at ingest.

``hyperplane_signatures`` (similarity.py) computes random-hyperplane bucket
ids in one Arrow pass; this module makes that pass a BUILD step whose output
is a parquet artifact — the "bucket columns materialized at ingest" story
that ``LshIndex`` only held in session memory.  Mirrors the inverted-index
lifecycle (build_index -> SparkIndex): signatures are computed ONCE, written
with a manifest, and every later query (ANN top-k, near-dup pair scan)
starts from the artifact instead of re-signing the corpus.

Layout at 100 TB:
- rows are range-partitioned on ``bucket_0`` and sorted by it within each
  partition, so every parquet row group carries tight min/max stats on the
  primary table's bucket id — a ``bucket_0 = q`` candidate probe prunes to
  a handful of row groups (verified by the pushed-filter check in
  tests).  The remaining tables' bucket columns are plain columns filtered
  during the (already pruned) scan; a deployment that needs equal pruning on
  every table writes one sorted projection per table, exactly like secondary
  indexes — same builder, ``sort_table=t``.
- the embedding column rides in the same artifact so candidate rescoring
  never joins back to the source table.
- the manifest pins (n_planes, n_tables, seed, dim, n_vectors); loading
  verifies the parameters so a query can never silently mix hyperplane
  families (bucket ids from different seeds are meaningless to compare).

No reference counterpart (the reference has no embedding/ANN machinery);
beyond-reference training-data op, same artifact discipline as
``indexing/build.py``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import near_dup_from_signed
from .similarity import _lsh_topk_from_signed, hyperplane_signatures

MANIFEST = "embedding_index_manifest.json"
SIGNATURES = "signatures"


def build_embedding_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out: str,
    n_planes: int | None = None,
    n_tables: int = 8,
    seed: int = 42,
    sort_table: int = 0,
) -> "EmbeddingIndex":
    """Sign ``embeddings`` (vec_id, embedding) once and persist
    (vec_id, embedding, bucket_0..bucket_{n_tables-1}) + manifest at ``out``.

    ``n_planes`` defaults to auto_n_planes(N): at ingest time the corpus
    size is known, so the bucket granularity is sized to keep expected
    occupancy constant rather than trusting a caller-pinned constant to
    survive corpus growth.  ``sort_table`` selects which table's bucket
    column orders the layout (range partition + within-partition sort) and
    therefore which table's probes get row-group pruning."""
    from .similarity import auto_n_planes

    drow = embeddings.select(F.size("embedding").alias("d")).first()
    dim = 0 if drow is None else int(drow["d"])
    if n_planes is None:
        n_planes = auto_n_planes(embeddings.count())
    signed = hyperplane_signatures(
        embeddings, n_planes=n_planes, n_tables=n_tables, seed=seed, dim=dim
    )
    sort_col = f"bucket_{sort_table}"
    sig_dir = os.path.join(out, SIGNATURES)
    # range partition on the sort bucket: each output file owns a contiguous
    # bucket range, so file- AND row-group-level min/max stats both prune.
    # (hash-partitioning would scatter every bucket across all files.)
    (
        signed.repartitionByRange(F.col(sort_col), F.col("vec_id"))
        .sortWithinPartitions(sort_col, "vec_id")
        .write.mode("overwrite")
        .parquet(sig_dir)
    )
    n_vectors = spark.read.parquet(sig_dir).count()
    manifest = {
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
        "dim": dim,
        "n_vectors": n_vectors,
        "sort_table": sort_table,
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return EmbeddingIndex(spark, out)


class EmbeddingIndex:
    """Read-back handle over a persisted signature artifact.  Queries start
    from the parquet signatures — no per-query signing pass, no access to
    the source embedding table."""

    def __init__(self, spark: SparkSession, path: str):
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = dict(json.load(f))
        self.path = path
        self.n_planes = int(self.manifest["n_planes"])
        self.n_tables = int(self.manifest["n_tables"])
        self.seed = int(self.manifest["seed"])
        self.dim = int(self.manifest["dim"])
        self.signed = spark.read.parquet(os.path.join(path, SIGNATURES))
        missing = [
            c
            for c in ["vec_id", "embedding"]
            + [f"bucket_{t}" for t in range(self.n_tables)]
            if c not in self.signed.columns
        ]
        if missing:
            raise ValueError(f"embedding index at {path} missing columns {missing}")

    def near_dups(self, threshold: float) -> DataFrame:
        """(vec_a, vec_b, sim_r) near-duplicate pairs from the persisted
        buckets — identical results to near_dup_embedding() with this
        index's parameters (the signature pass ran at build time)."""
        return near_dup_from_signed(
            self.signed, n_tables=self.n_tables, threshold=threshold, dim=self.dim
        )

    def topk(self, query_vec_id: int, k: int = 10) -> DataFrame:
        """LSH candidate probe + exact cosine re-rank, reading only the
        artifact.  The query row's buckets come from a vec_id point lookup
        (parquet-pushed filter); candidates are the OR of its buckets."""
        return _lsh_topk_from_signed(self.signed, self.n_tables, query_vec_id, k)
