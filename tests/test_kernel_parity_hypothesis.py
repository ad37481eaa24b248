"""Property-based parity: the Arrow kernels must be BIT-identical to their
pure-expression twins on arbitrary text — not just the fixture corpora.
Alphabet mixes ASCII words, punctuation, hyphens, runs of spaces, newlines
and non-ASCII so the lower()/split/md5 agreement is exercised where engines
most plausibly diverge."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ALPHABET = "abcXYZ012 -  \n.'\"éß☃"
texts = st.lists(st.text(alphabet=ALPHABET, max_size=40), min_size=1, max_size=6)

COMMON = dict(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, xs):
    return spark.createDataFrame(list(enumerate(xs)), "doc_id long, text string")


@settings(**COMMON)
@given(xs=texts)
def test_shingle_kernel_parity(spark, xs):
    from searchengine_spark.pipeline.dedup import shingle_table, shingle_table_expr

    docs = _docs(spark, xs)
    a = sorted(tuple(r) for r in shingle_table(docs).collect())
    b = sorted(tuple(r) for r in shingle_table_expr(docs).collect())
    assert a == b


@settings(**COMMON)
@given(xs=texts)
def test_minhash_kernel_parity(spark, xs):
    from searchengine_spark.pipeline.dedup import _minhash_wide, _minhash_wide_expr

    docs = _docs(spark, xs)
    a = sorted(tuple(r) for r in _minhash_wide(docs, 4).collect())
    b = sorted(tuple(r) for r in _minhash_wide_expr(docs, 4).collect())
    assert a == b


@settings(**COMMON)
@given(xs=texts)
def test_tokenize_kernel_parity(spark, xs):
    """The pyarrow/re2 tokenize kernel (default build path) must emit the
    exact (doc_id, position, term) multiset as the expression twin on
    arbitrary text — positions shared across hyphen variants, empty types
    retained, Java-\\s strip semantics, non-ASCII deletion."""
    from searchengine_spark.text.spark_tokenize import tokenize

    docs = _docs(spark, xs)
    a = sorted(tuple(r) for r in tokenize(docs, use_kernel=True).collect())
    b = sorted(tuple(r) for r in tokenize(docs, use_kernel=False).collect())
    assert a == b


@settings(**COMMON)
@given(xs=texts)
def test_simhash_kernel_parity(spark, xs):
    from searchengine_spark.pipeline import simhash, simhash_kernel

    docs = _docs(spark, xs)
    a = {r["doc_id"]: r["simhash"] for r in simhash_kernel(docs, bits=8).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=8).collect()}
    assert a == b
