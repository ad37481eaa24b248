"""Q7 matches() predicate: scan-side AST evaluation must agree with the
reference semantics (phrase approximated as AND — phraseliteral.py:68-69),
and with the index path on phrase-free queries."""

import pytest

MATCH_QUERIES = ["cat dog", "cat + dog", "cat -dog", "index query"]


@pytest.mark.parametrize("query", MATCH_QUERIES)
def test_matches_agrees_with_index_path(spark_index, query):
    from searchengine_spark.querying.boolean import boolean_search, matches_search

    got = {r["doc_id"] for r in matches_search(spark_index, query).collect()}
    want = {r["doc_id"] for r in boolean_search(spark_index, query).collect()}
    assert got == want


def test_matches_phrase_is_and_approximation(spark_index, oracle_index):
    from searchengine_spark.querying.boolean import matches_search

    got = {r["doc_id"] for r in matches_search(spark_index, '"quick fox"').collect()}
    want = oracle_index.search_boolean("quick fox")  # AND, not adjacency
    assert got == want


def test_matches_negative_or_disjunct_reference_divergence(spark_index):
    """'cat + -dog' — reference-faithful divergence pin: the scan path
    evaluates contains(cat) OR NOT contains(dog) (orquery.py:25-26,
    notquery.py:18-19) while the index path yields docs(cat) (a bare NOT
    disjunct contributes nothing).  Both behaviors are intentional; the
    oracle twin refuses the query rather than miscompiling it."""
    import pytest as _pytest

    from searchengine_spark import duck_oracle as dk
    from searchengine_spark.querying.boolean import boolean_search, matches_search

    q = "cat + -dog"
    idx_docs = {r["doc_id"] for r in boolean_search(spark_index, q).collect()}
    scan_docs = {r["doc_id"] for r in matches_search(spark_index, q).collect()}
    cat = {r["doc_id"] for r in boolean_search(spark_index, "cat").collect()}
    dog = {r["doc_id"] for r in boolean_search(spark_index, "dog").collect()}
    universe = {r["doc_id"] for r in spark_index.doc_stats.select("doc_id").collect()}
    assert idx_docs == cat
    assert scan_docs == cat | (universe - dog)
    with _pytest.raises(ValueError, match="negative-only"):
        dk.sql_matches(q)


def test_matches_doc_terms_persisted_and_reused(spark_index):
    """Round-4 fix: the doc->term-set aggregation behind matches_search runs
    once per index and is persisted; the second query's plan reads the cache
    (InMemoryTableScan) instead of re-aggregating postings."""
    from searchengine_spark.querying.boolean import matches_search

    matches_search(spark_index, "quick fox").count()
    handle = getattr(spark_index, "_matches_doc_terms", None)
    assert handle is not None and handle.is_cached
    plan = (
        matches_search(spark_index, "lazy dog")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" in plan
    assert "mapInPandas" not in plan.lower() or "InMemoryTableScan" in plan


def test_doc_terms_build_artifact(spark, tmp_path):
    """Opt-in doc_terms artifact (round-4 next item #8): an index built with
    doc_terms_artifact=True answers matches() from a parquet SCAN in a
    fresh session — no postings aggregation — with identical results to the
    aggregate-on-first-use path."""
    import os

    from searchengine_spark.indexing import SparkIndex, build_index
    from searchengine_spark.querying.boolean import matches_search

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta" if i % 7 else "") for i in range(40)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "dt_idx")
    build_index(spark, docs, out, doc_terms_artifact=True)
    assert os.path.exists(os.path.join(out, "doc_terms", "_SUCCESS"))

    idx = SparkIndex(spark, out)  # fresh handle = fresh serving session
    got = sorted(r["doc_id"] for r in matches_search(idx, "alpha + tok1").collect())
    # artifact path taken: the cached frame's plan is a parquet scan of the
    # artifact, not an aggregation over postings
    plan = idx._matches_doc_terms._jdf.queryExecution().executedPlan().toString()
    assert "doc_terms" in plan and "collect_set" not in plan

    out2 = str(tmp_path / "dt_idx_plain")
    build_index(spark, docs, out2)
    assert not os.path.exists(os.path.join(out2, "doc_terms"))
    idx2 = SparkIndex(spark, out2)
    want = sorted(r["doc_id"] for r in matches_search(idx2, "alpha + tok1").collect())
    assert got == want and got
