"""Oracle unit tests: micro-index goldens ported from
reference tests/test_morristestindexing.py:5-54, Boolean/phrase merges, and
ranked-scoring hand-checks."""

import math

import pytest

from searchengine_spark.oracle import OracleIndex, build_oracle_index


@pytest.fixture
def micro_index():
    # reference fixture: cat@(1,{0,2}), dog@(2,{1}) — positions added raw
    idx = OracleIndex()
    idx.postings = {"cat": {1: [0, 2]}, "dog": {2: [1]}}
    return idx


def test_get_postings_found(micro_index):
    assert micro_index.get_postings("cat") == {1: [0, 2]}


def test_get_postings_not_found(micro_index):
    assert micro_index.get_postings("elephant") == {}
    assert micro_index.get_postings("") == {}


def test_vocabulary(micro_index):
    assert micro_index.vocabulary() == ["cat", "dog"]


@pytest.fixture
def corpus_index():
    docs = [
        (0, ["the quick brown fox jumps over the lazy dog"]),
        (1, ["the quick fox runs"]),
        (2, ["a lazy dog sleeps"]),
        (3, ["quick quick fox fox fox"]),
        (4, ["dogs and cats and state-of-the-art engines"]),
    ]
    return build_oracle_index(docs)


def test_doc_stats(corpus_index):
    assert corpus_index.n_docs == 5
    assert corpus_index.doc_length[0] == 9
    # doc 4: 6 raw tokens, hyphen token expands to 5 terms (4 parts + concat)
    assert corpus_index.doc_length[4] == 10
    assert corpus_index.total_tokens == sum(corpus_index.doc_length.values())


def test_positions_and_tf(corpus_index):
    # "quick" in doc 3 at raw positions 1,2 ; "fox" at 3,4,5
    assert corpus_index.get_postings("quick")[3] == [1, 2]
    assert corpus_index.get_postings("fox")[3] == [3, 4, 5]
    assert corpus_index.df("fox") == 3
    assert corpus_index.cf("fox") == 5


def test_stemming_applied(corpus_index):
    # "jumps" -> "jump", "runs" -> "run", "dogs" -> "dog", "engines" -> "engin"
    assert 0 in corpus_index.get_postings("jump")
    assert 1 in corpus_index.get_postings("run")
    assert 4 in corpus_index.get_postings("dog")
    assert 4 in corpus_index.get_postings("engin")


def test_boolean_and(corpus_index):
    assert corpus_index.search_boolean("quick fox") == {0, 1, 3}
    assert corpus_index.search_boolean("quick dog") == {0}


def test_boolean_or(corpus_index):
    assert corpus_index.search_boolean("cat + sleeps") == {2, 4}


def test_boolean_and_not(corpus_index):
    assert corpus_index.search_boolean("quick -dog") == {1, 3}


def test_boolean_phrase(corpus_index):
    assert corpus_index.search_boolean('"quick fox"') == {1, 3}
    assert corpus_index.search_boolean('"quick brown fox"') == {0}
    assert corpus_index.search_boolean('"fox quick"') == set()


def test_phrase_positions_carry_forward(corpus_index):
    # doc 3: quick@{1,2} fox@{3,4,5} -> "quick fox" matches at fox-pos 3
    assert corpus_index._eval_phrase(("quick", "fox")) == {1: [3], 3: [3]}


def test_hyphen_phrase_positions_shared(corpus_index):
    # state-of-the-art: all variants at position 4 of doc 4 -> "state art"
    # are at the SAME position, so not adjacent; "of the" also same position
    assert corpus_index.get_postings("state")[4] == [5]
    assert corpus_index.get_postings("art")[4] == [5]
    assert corpus_index.get_postings("stateoftheart")[4] == [5]


def test_bm25_hand_check(corpus_index):
    n = corpus_index.n_docs
    avgdl = corpus_index.avgdl
    # query "fox" (its own stem): df=3
    df = 3
    wqt = max(0.1, math.log((n - df + 0.5) / (df + 0.5)))
    results = dict(corpus_index.rank("fox", mode="bm25"))
    for doc_id, tf in [(0, 1), (1, 1), (3, 3)]:
        dl = corpus_index.doc_length[doc_id]
        wdt = 2.2 * tf / (1.2 * (0.25 + 0.75 * (dl / avgdl)) + tf)
        assert results[doc_id] == pytest.approx(wqt * wdt, rel=1e-12)


def test_tfidf_hand_check(corpus_index):
    n = corpus_index.n_docs
    df = 3
    wqt = math.log(1 + n / df)
    results = dict(corpus_index.rank("fox", mode="tfidf"))
    tf = 3
    wdt = 1 + math.log(tf)
    l_d = corpus_index.l2_weight(3)
    assert results[3] == pytest.approx(wqt * wdt / l_d, rel=1e-12)


def test_ranked_query_not_stemmed(corpus_index):
    # "jumps" is indexed as "jump"; ranked path does NOT stem the query so
    # "jumps" finds nothing (SURVEY.md §8.Q1)
    assert corpus_index.rank("jumps", mode="bm25") == []
    assert corpus_index.rank("jump", mode="bm25") != []


def test_rank_order_and_tiebreak(corpus_index):
    ranked = corpus_index.rank("quick fox", mode="bm25")
    scores = [s for _, s in ranked]
    assert scores == sorted(scores, reverse=True)
    # doc 3 has the highest tf for both terms
    assert ranked[0][0] == 3


def test_unknown_tfidf_term_skipped(corpus_index):
    assert corpus_index.rank("zebra", mode="tfidf") == []
