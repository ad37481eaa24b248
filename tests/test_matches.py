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
