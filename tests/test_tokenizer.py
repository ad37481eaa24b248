"""Tokenizer + stemmer goldens, ported from the reference test suite
(reference: engine/text/testprocessing.py:18-58) plus extra Porter2 vectors
and position-semantics checks (reference: engine/text/preprocessing.py:65-80).
"""

from searchengine_spark.text import (
    normalize_type,
    preprocess_boolean_query,
    preprocess_ranked_query,
    process_token,
    terms_with_positions,
    tokenize_line,
)
from searchengine_spark.text.porter2 import stem


def process_stream(source_text: str) -> list[str]:
    out = []
    for tok in tokenize_line(source_text):
        out.extend(process_token(tok))
    return out


def test_punctuation_removal():
    assert process_stream("Hello, world!") == ["hello", "world"]
    assert process_stream("\"'Please remove all single and double quotes.'\"") == [
        "please",
        "remove",
        "all",
        "single",
        "and",
        "double",
        "quotes",
    ]


def test_tokenization():
    assert process_stream("This is a sentence") == ["this", "is", "a", "sentence"]


def test_lowercase():
    assert process_stream("Hello World") == ["hello", "world"]


def test_beg_end():
    assert process_stream("Hello.") == ["hello"]
    assert process_stream("192.168.1.1") == ["192.168.1.1"]


def test_question():
    assert process_stream("Hello?") == ["hello"]


def test_hyphens():
    assert process_stream("Hewlett-Packard-Computing") == [
        "hewlett",
        "packard",
        "computing",
        "hewlettpackardcomputing",
    ]


def test_stemming():
    assert normalize_type("running") == "run"
    assert normalize_type("runner") == "runner"


def test_non_ascii_stripped():
    assert process_stream("café naïve") == ["caf", "nave"]


def test_porter2_vectors():
    # hand-checked against the published Snowball English algorithm
    vectors = {
        "running": "run",
        "runner": "runner",
        "ran": "ran",
        "jumped": "jump",
        "jumps": "jump",
        "quickly": "quick",
        "happiness": "happi",
        "happy": "happi",
        "generously": "generous",
        "agreement": "agreement",
        "meetings": "meet",
        "hoping": "hope",
        "hopping": "hop",
        "ties": "tie",
        "cries": "cri",
        "skies": "sky",
        "dying": "die",
        "news": "news",
        "proceed": "proceed",
        "inning": "inning",
        "conditional": "condit",
        "rational": "ration",
        "national": "nation",
        "searching": "search",
        "searches": "search",
        "indexes": "index",
        "indexing": "index",
        "queries": "queri",
        "query": "queri",
        "engine": "engin",
        "engines": "engin",
        "the": "the",
        "a": "a",
        "cat": "cat",
        "cats": "cat",
        "dogs": "dog",
        "192.168.1.1": "192.168.1.1",
    }
    for word, expect in vectors.items():
        assert stem(word) == expect, f"stem({word!r}) = {stem(word)!r}, want {expect!r}"


def test_positions_one_based_and_shared_across_hyphen_variants():
    # position counts raw tokens; hyphen variants share it
    # (reference preprocessing.py:70-77)
    got = list(terms_with_positions(["alpha state-of-the-art beta"]))
    assert got == [
        ("alpha", 1),
        ("state", 2),
        ("of", 2),
        ("the", 2),
        ("art", 2),
        ("stateoftheart", 2),
        ("beta", 3),
    ]


def test_empty_terms_emitted_but_positions_advance():
    # a token that cleans to "" is still emitted (doc_length counts it)
    got = list(terms_with_positions(["alpha — beta"]))
    assert got == [("alpha", 1), ("", 2), ("beta", 3)]


def test_boolean_query_preprocessing():
    assert preprocess_boolean_query("Running QUICKLY!") == "run quick"
    assert preprocess_boolean_query("Hewlett-Packard") == "hewlett packard hewlettpackard"


def test_ranked_query_preprocessing_is_lower_split_only():
    # SURVEY.md §8.Q1: ranked path skips the tokenizer entirely
    assert preprocess_ranked_query("Running QUICKLY!") == ["running", "quickly!"]
