"""Round-5 robustness fixes (post-review):

* tier-merge journal replay survives a crash between the term_stats rmtree
  and the replace (idempotent replay, no FileNotFoundError);
* an index whose manifest predates tier tracking ADOPTS its files as the
  main tier instead of re-sorting the whole index as "delta";
* a rebuild without doc_terms_artifact removes a previous build's stale
  doc_terms parquet (matches() must never answer from an old corpus);
* an Iceberg stage whose snapshot-id pin failed post-commit still counts as
  done for resume (committed flag is the durable marker);
* SparkIndex opens artifacts through the manifest's per-stage sink, so an
  Iceberg-committed index is servable.
"""

import json
import os
import shutil

import pytest


def _mk_turns(spark, conv_start, n_convs, words_per_turn=6):
    import datetime

    from searchengine_spark.data import spark_schema

    rows = []
    for c in range(conv_start, conv_start + n_convs):
        for t in range(3):
            text = " ".join(f"tok{(c * 7 + t * 3 + w) % 23}" for w in range(words_per_turn))
            rows.append((f"conv{c:05d}", t, "user", text, "", datetime.datetime(2026, 1, 1)))
    return spark.createDataFrame(rows, schema=spark_schema())


def test_journal_replay_survives_missing_term_stats(tmp_path_factory, spark):
    """Crash window: rmtree(term_stats) succeeded, os.replace didn't run.
    The replay must rebuild term_stats rather than trip over the missing
    directory (regression: rmtree without ignore_errors)."""
    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("crash_idx"))
    indexer = StreamingIndexer(spark, out, n_partitions=4, max_artifact_files=1)
    indexer.process_batch(_mk_turns(spark, 0, 10), epoch_id=0)
    indexer.compact()

    orig_apply = indexer._apply_merge_journal
    indexer._apply_merge_journal = lambda m: (_ for _ in ()).throw(
        RuntimeError("simulated crash mid-merge")
    )
    indexer.process_batch(_mk_turns(spark, 10, 2), epoch_id=1)
    with pytest.raises(RuntimeError):
        indexer.compact()
    assert indexer._manifest().get("merge_journal")

    # reproduce the exact crash state: term_stats removed, tmp staged
    ts = os.path.join(out, "term_stats")
    shutil.copytree(ts, os.path.join(out, "term_stats_tmp"))
    shutil.rmtree(ts)

    indexer._apply_merge_journal = orig_apply
    indexer.process_batch(_mk_turns(spark, 12, 2), epoch_id=2)
    indexer.compact()  # replay must complete despite the missing dir
    assert not indexer._manifest().get("merge_journal")
    idx = SparkIndex(spark, out)
    assert idx.n_docs == (10 + 2 + 2) * 3
    assert idx.term_stats.count() > 0


def test_pre_tier_manifest_adopts_files_as_main_tier(tmp_path_factory, spark):
    """A manifest without tier_files (index predates the feature) must NOT
    treat every file as delta — the first over-threshold compact would
    re-sort the entire index.  It adopts the on-disk files as the main
    tier and only later appends merge."""
    from searchengine_spark.streaming import StreamingIndexer

    out = str(tmp_path_factory.mktemp("adopt_idx"))
    indexer = StreamingIndexer(spark, out, n_partitions=4, max_artifact_files=1)
    indexer.process_batch(_mk_turns(spark, 0, 8), epoch_id=0)
    indexer.compact()
    indexer.process_batch(_mk_turns(spark, 8, 2), epoch_id=1)

    # simulate the pre-feature manifest
    m = indexer._manifest()
    m.pop("tier_files", None)
    indexer._save(m)

    before = {
        a: sorted(os.listdir(os.path.join(out, a)))
        for a in ("postings", "segments", "doc_stats")
    }
    merged = indexer._maybe_merge_tiers(indexer._manifest())
    assert merged is False, "adoption pass must not merge"
    m = indexer._manifest()
    assert set(m["tier_files"]) == {"postings", "segments", "doc_stats"}
    after = {
        a: sorted(os.listdir(os.path.join(out, a)))
        for a in ("postings", "segments", "doc_stats")
    }
    assert after == before, "adoption must not touch any artifact file"
    # and the adopted tier equals what was on disk
    for a, files in m["tier_files"].items():
        assert files == [f for f in before[a] if f.endswith(".parquet")]


def test_rebuild_without_flag_removes_stale_doc_terms(tmp_path_factory, spark):
    from searchengine_spark.indexing import SparkIndex, build_index, prepare_transcripts
    from searchengine_spark.querying.boolean import matches_search

    out = str(tmp_path_factory.mktemp("stale_dt"))
    docs_a = prepare_transcripts(_mk_turns(spark, 0, 10))
    build_index(spark, docs_a, out, doc_terms_artifact=True)
    assert os.path.exists(os.path.join(out, "doc_terms", "_SUCCESS"))

    # rebuild the SAME dir over a different corpus without the opt-in
    docs_b = prepare_transcripts(_mk_turns(spark, 50, 4))
    build_index(spark, docs_b, out)
    assert not os.path.isdir(os.path.join(out, "doc_terms"))
    with open(os.path.join(out, "manifest.json")) as f:
        assert "doc_terms" not in json.load(f)["stages"]

    idx = SparkIndex(spark, out)
    n = matches_search(idx, "tok1").count()
    # fallback aggregation over the NEW postings, not the old artifact
    assert n == idx.postings.filter("term = 'tok1'").select("doc_id").distinct().count()


def test_iceberg_stage_done_accepts_committed_without_snapshot(tmp_path_factory, spark):
    from searchengine_spark.indexing.build import IndexBuilder

    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("ib")))
    b._iceberg_ok = True
    b.manifest["stages"]["postings"] = {
        "format": "iceberg",
        "table": "cat.db.t_postings",
        "committed": True,
        "snapshot_id": None,  # .snapshots metadata query failed post-commit
    }
    assert b._stage_done("postings") is True
    b.manifest["stages"]["postings"]["committed"] = False
    assert b._stage_done("postings") is False
    b.manifest["stages"]["postings"]["snapshot_id"] = 77
    assert b._stage_done("postings") is True


def test_spark_index_opens_iceberg_artifacts_via_manifest(
    tmp_path_factory, spark, index_dir, monkeypatch
):
    """Manifest says the stages live as Iceberg tables -> SparkIndex reads
    through read_artifact (catalog), not the parquet dirs."""
    from searchengine_spark.indexing import SparkIndex
    from searchengine_spark.sources import iceberg as icemod

    out = str(tmp_path_factory.mktemp("ice_idx"))
    stages = {}
    for a in ("postings", "doc_stats", "term_stats", "corpus_stats"):
        # artifacts "live" in the catalog: move them OUT of the index dir
        shutil.copytree(os.path.join(index_dir, a), os.path.join(out, f"_tbl_{a}"))
        stages[a] = {"format": "iceberg", "table": f"cat.db.idx_{a}", "committed": True}
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump({"stages": stages}, f)

    calls = []

    def fake_read_artifact(sp, target):
        assert target.startswith("iceberg:cat.db.idx_")
        calls.append(target)
        name = target[len("iceberg:cat.db.idx_"):]
        return sp.read.parquet(os.path.join(out, f"_tbl_{name}"))

    monkeypatch.setattr(icemod, "read_artifact", fake_read_artifact)
    idx = SparkIndex(spark, out)
    ref = SparkIndex(spark, index_dir)
    assert len(calls) == 4
    assert idx.n_docs == ref.n_docs
    assert idx.postings.count() == ref.postings.count()


def test_background_postings_write_failure_surfaces(tmp_path_factory, spark, monkeypatch):
    """A postings-stage write failure must fail the BUILD and leave the
    stage unmarked for resume — on the fused-sink path the segments side
    files are committed by the same job, so neither artifact may be
    marked done."""
    from searchengine_spark.indexing.build import IndexBuilder

    out = str(tmp_path_factory.mktemp("overlap_fail"))
    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 5}") for i in range(40)], "doc_id long, text string"
    )
    builder = IndexBuilder(spark, out)
    orig = IndexBuilder._write_stage

    def failing(self, df, name):
        if name == "postings":
            raise RuntimeError("injected postings write failure")
        return orig(self, df, name)

    monkeypatch.setattr(IndexBuilder, "_write_stage", failing)
    with pytest.raises(RuntimeError, match="injected postings write failure"):
        builder.build(docs)
    # the failed stage must not be marked done in the manifest
    assert "postings" not in builder.manifest.get("stages", {})


def test_fused_metrics_match_direct_recompute(tmp_path_factory, spark):
    """segment_bytes_compressed / n_segment_blocks now come from the
    dictionary's per-term postings_bytes aggregation; they must equal a
    direct scan of the segments table, and the dictionary's per-term bytes
    must sum blob-for-blob."""
    import pyspark.sql.functions as F

    from searchengine_spark.indexing.build import build_index

    out = str(tmp_path_factory.mktemp("fused_metrics"))
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 3 + j) % 17}" for j in range(12))) for i in range(120)],
        "doc_id long, text string",
    )
    m = build_index(spark, docs, out)
    seg = spark.read.parquet(os.path.join(out, "segments"))
    direct = seg.agg(
        F.count("*").alias("b"), F.sum(F.octet_length("postings_bin")).alias("s")
    ).collect()[0]
    assert m["metrics"]["n_segment_blocks"] == direct["b"]
    assert m["metrics"]["segment_bytes_compressed"] == direct["s"]
    ts = spark.read.parquet(os.path.join(out, "term_stats"))
    per_term = {
        r["term"]: r["postings_bytes"]
        for r in ts.select("term", "postings_bytes").collect()
    }
    per_term_direct = {
        r["term"]: r["s"]
        for r in seg.groupBy("term")
        .agg(F.sum(F.octet_length("postings_bin")).alias("s"))
        .collect()
    }
    assert per_term == per_term_direct
