"""Parser AST-shape goldens ported from reference tests/test_query.py:18-58."""

import pytest

from searchengine_spark.querying import And, Not, Or, Phrase, Term, parse_query


def test_parse_simple_query():
    q = parse_query("cat dog")
    assert isinstance(q, And)
    assert q.children == (Term("cat"), Term("dog"))


def test_parse_or_query():
    q = parse_query("cat + dog")
    assert isinstance(q, Or)
    assert q.children == (Term("cat"), Term("dog"))


def test_parse_mixed_query():
    q = parse_query('cat dog + mouse "quick fox"')
    assert isinstance(q, Or)
    assert len(q.children) == 2
    left, right = q.children
    assert isinstance(left, And) and len(left.children) == 2
    assert isinstance(right, And) and len(right.children) == 2
    assert right.children[1] == Phrase(("quick", "fox"))


def test_and_not_query():
    q = parse_query("cat -dog")
    assert isinstance(q, And)
    assert q.children[0] == Term("cat")
    assert isinstance(q.children[1], Not)
    assert q.children[1].child == Term("dog")


def test_single_word_phrase_degrades_to_term():
    # reference booleanqueryparser.py:104-112
    assert parse_query('"cat"') == Term("cat")


def test_literals_are_preprocessed_during_parse():
    # reference booleanqueryparser.py:83,118 — stem applied at parse time
    assert parse_query("Running") == Term("run")
    assert parse_query('"Quick Foxes"') == Phrase(("quick", "fox"))


def test_hyphenated_literal_becomes_and_of_variants():
    # documented divergence (parser.py module docstring)
    q = parse_query("hewlett-packard")
    assert isinstance(q, And)
    assert q.children == (Term("hewlett"), Term("packard"), Term("hewlettpackard"))


def test_malformed_phrase_raises():
    with pytest.raises(ValueError):
        parse_query('"unclosed phrase')


def test_empty_query_raises():
    with pytest.raises(ValueError):
        parse_query("   ")
