"""Iceberg transcript source: schema contract, dispatch, capability gating.

The sandbox has no Iceberg runtime jar, so the live ``format("iceberg")``
read cannot run here; what IS tested is everything that runs either way —
the input_hint schema validation, the front-door dispatch, the time-travel
argument plumbing, and that the unavailable path fails loudly with the
exact spark-submit remedy instead of a raw ClassNotFoundException.  A
cluster with the runtime present exercises the same code path end-to-end
(the reader branch differs only in ``spark.read.format``).
"""

import pytest

from searchengine_spark.sources.iceberg import (
    IcebergUnavailable,
    iceberg_available,
    read_transcripts,
    read_transcripts_iceberg,
    validate_transcript_schema,
)

HAS_ICEBERG = None  # resolved lazily against the session fixture


def test_validate_accepts_contract_schema(transcripts_df):
    out = validate_transcript_schema(transcripts_df)
    assert out is transcripts_df


def test_validate_allows_extra_columns(transcripts_df):
    from pyspark.sql import functions as F

    widened = transcripts_df.withColumn("shard", F.lit(3))
    assert validate_transcript_schema(widened) is widened


def test_validate_rejects_missing_column(transcripts_df):
    with pytest.raises(ValueError, match="missing column tool"):
        validate_transcript_schema(transcripts_df.drop("tool"))


def test_validate_rejects_wrong_type(transcripts_df):
    from pyspark.sql import functions as F

    bad = transcripts_df.withColumn("turn_idx", F.col("turn_idx").cast("long"))
    with pytest.raises(ValueError, match="turn_idx is bigint"):
        validate_transcript_schema(bad)


def test_front_door_reads_parquet(spark, transcripts_df, tmp_path):
    path = str(tmp_path / "transcripts.parquet")
    transcripts_df.write.parquet(path)
    df = read_transcripts(spark, path)
    assert df.count() == transcripts_df.count()
    assert set(c for c in df.columns) >= {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_front_door_rejects_time_travel_on_parquet(spark, transcripts_df, tmp_path):
    path = str(tmp_path / "t2.parquet")
    transcripts_df.limit(1).write.parquet(path)
    with pytest.raises(ValueError, match="require an iceberg: source"):
        read_transcripts(spark, path, snapshot_id=7)


def test_iceberg_paths_gate_on_capability(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; live read covered on-cluster")
    with pytest.raises(IcebergUnavailable, match="spark-submit"):
        read_transcripts_iceberg(spark, "lake.db.transcripts")
    with pytest.raises(IcebergUnavailable, match="--packages org.apache.iceberg"):
        read_transcripts(spark, "iceberg:lake.db.transcripts", snapshot_id=42)


def test_built_index_from_front_door_matches_direct(spark, transcripts_df, tmp_path):
    """The front door feeds prepare_transcripts unchanged: same docIDs,
    same per-turn text under the stable (conv_id, turn_idx) order."""
    from searchengine_spark.indexing.build import (
        prepare_transcripts,
        release_docid_caches,
    )

    path = str(tmp_path / "t3.parquet")
    transcripts_df.write.parquet(path)
    try:
        via_front = prepare_transcripts(read_transcripts(spark, path)).select(
            "doc_id", "title", "text"
        )
        direct = prepare_transcripts(transcripts_df).select("doc_id", "title", "text")
        assert via_front.exceptAll(direct).count() == 0
        assert direct.exceptAll(via_front).count() == 0
    finally:
        release_docid_caches()
