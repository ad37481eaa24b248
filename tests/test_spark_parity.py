"""Spark engine vs single-node oracle parity (SURVEY.md §5, FIXTURES.md §2-3).

Every structure the Spark build produces is compared against the
reference-semantics oracle on the same deterministic transcript corpus:
tokens, postings, term/doc/corpus stats, Boolean result sets, and
rank-identical ranked top-k (score rtol 1e-9, ties by doc_id).
"""

import math

import pytest
from pyspark.sql import functions as F

BOOLEAN_QUERIES = [
    "cat dog",
    "cat + dog",
    "cat -dog",
    '"quick fox"',
    'cat dog + mouse "quick fox"',
    'shakes "jamba juice"',
    "hewlett-packard",
    "192.168.1.1",
]

RANKED_QUERIES = ["quick fox jump", "the search engine", "tool bash error", "index"]


@pytest.fixture(scope="session")
def oracle_docs(turns):
    from searchengine_spark.data import docs_in_stable_order

    return docs_in_stable_order(turns)


def test_doc_id_assignment_matches_stable_order(spark, transcripts_df, turns):
    from searchengine_spark.indexing import prepare_transcripts
    from searchengine_spark.indexing.build import release_docid_cache_of

    docs = prepare_transcripts(transcripts_df)
    got = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in docs.select("conv_id", "turn_idx", "doc_id").collect()
    }
    release_docid_cache_of(docs)
    ordered = sorted(turns, key=lambda t: (t.conv_id, t.turn_idx))
    want = {(t.conv_id, t.turn_idx): i for i, t in enumerate(ordered)}
    assert got == want


def test_per_turn_text_equality_invariant(spark, transcripts_df, turns):
    # north_rule invariant: the engine's stable (conv_id, turn_idx) projection
    # equals the input exactly
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in transcripts_df.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = [(t.conv_id, t.turn_idx, t.text) for t in sorted(turns, key=lambda t: (t.conv_id, t.turn_idx))]
    assert got == want


def test_tokenize_parity(spark, transcripts_df, oracle_docs):
    from searchengine_spark.indexing import prepare_transcripts
    from searchengine_spark.text.spark_tokenize import tokenize

    from searchengine_spark.indexing.build import release_docid_cache_of

    docs = prepare_transcripts(transcripts_df)
    got = sorted(
        (r["doc_id"], r["position"], r["term"])
        for r in tokenize(docs).collect()
    )
    release_docid_cache_of(docs)
    want = []
    from searchengine_spark.text import terms_with_positions

    for doc_id, content in oracle_docs:
        for term, pos in terms_with_positions(content):
            want.append((doc_id, pos, term))
    assert got == sorted(want)


def test_tokenize_kernel_matches_expression(spark):
    """The Arrow tokenize kernel (re2/pyarrow, the default build path) must
    emit the exact multiset of (doc_id, position, term) rows as the
    pure-expression twin — including hyphen-variant positions, retained
    empty types, Java-\\s strip semantics (\\x0B!), and unicode cleaning."""
    from searchengine_spark.text.spark_tokenize import tokenize

    fixtures = [
        (0, "Hello world — the QUICK brown-fox jumps"),
        (1, ""),
        (2, "- — \t tabs\tand\tunicode café naïve"),
        (3, "hello  double  space"),
        (4, "multi\nline\ntext here"),
        (5, "lead-ing- -trail --double-- a-b-c"),
        (6, None),
        (7, "\x0bvertical\x0btab mixed \x0b"),
        (8, "quo'tes \"and\" spaces"),
        (9, "ASCII123 Ünïcödé ☃ emoji-😀-test"),
    ]
    docs = spark.createDataFrame(fixtures, "doc_id long, text string")
    k = sorted(
        (r["doc_id"], r["position"], r["term"])
        for r in tokenize(docs, use_kernel=True).collect()
    )
    e = sorted(
        (r["doc_id"], r["position"], r["term"])
        for r in tokenize(docs, use_kernel=False).collect()
    )
    assert k == e


def test_stem_udf_stays_on_the_dictionary_side(spark):
    """Regression: Catalyst constraint propagation once inferred
    _stem_udf(type) != '' from a downstream term != '' filter and pushed the
    Python UDF onto EVERY ROW of the token stream (one full-stream
    ArrowEvalPython pass per build action — the sample and map passes each
    paid ~8x).  With the UDF declared nondeterministic the executed plan
    must contain exactly ONE ArrowEvalPython: the stem over the distinct
    type dictionary."""
    from pyspark.sql import functions as F

    from searchengine_spark.text.spark_tokenize import _stem_udf, tokenize

    assert _stem_udf.deterministic is False
    docs = spark.createDataFrame(
        [(0, "running runs ran"), (1, "jump jumped")], "doc_id long, text string"
    )
    stream = tokenize(docs).filter(F.col("term") != "")
    plan = stream._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_postings_parity(spark_index, oracle_index):
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in spark_index.postings.collect()
    }
    want = {}
    for term, docs in oracle_index.postings.items():
        for doc_id, positions in docs.items():
            want[(term, doc_id)] = (len(positions), positions)
    assert got == want


def test_term_stats_parity(spark_index, oracle_index):
    got = {r["term"]: (r["df"], r["cf"]) for r in spark_index.term_stats.collect()}
    want = {t: (oracle_index.df(t), oracle_index.cf(t)) for t in oracle_index.vocabulary()}
    assert got == want


def test_doc_stats_parity(spark_index, oracle_index):
    rows = spark_index.doc_stats.collect()
    assert len(rows) == oracle_index.n_docs
    for r in rows:
        doc_id = r["doc_id"]
        assert r["doc_len"] == oracle_index.doc_length[doc_id]
        assert r["l2_weight"] == pytest.approx(oracle_index.l2_weight(doc_id), rel=1e-12)


def test_corpus_stats_parity(spark_index, oracle_index):
    assert spark_index.n_docs == oracle_index.n_docs
    assert spark_index.total_tokens == oracle_index.total_tokens
    assert spark_index.avgdl == pytest.approx(oracle_index.avgdl, rel=1e-12)


@pytest.mark.parametrize("query", BOOLEAN_QUERIES)
def test_boolean_parity(spark_index, oracle_index, query):
    from searchengine_spark.querying.boolean import boolean_search

    got = {r["doc_id"] for r in boolean_search(spark_index, query).collect()}
    want = oracle_index.search_boolean(query)
    assert got == want
    assert want, f"vacuous golden for {query!r}"  # every golden must match something


@pytest.mark.parametrize("query", RANKED_QUERIES)
@pytest.mark.parametrize("mode", ["bm25", "tfidf"])
def test_ranked_parity(spark_index, oracle_index, query, mode):
    from searchengine_spark.querying.ranked import ranked_search

    got = [(r["doc_id"], r["score"]) for r in ranked_search(spark_index, query, mode=mode, k=10).collect()]
    want = oracle_index.rank(query, mode=mode, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    assert want, f"vacuous ranked golden for {query!r}"


def test_ranked_filtered_parity(spark_index, oracle_index, turns):
    """role/tool-filtered ranked queries: Spark filter vs oracle filtered by
    the same metadata (the transcript-schema query extension)."""
    from searchengine_spark.querying.ranked import ranked_search, role_tool_filter

    ordered = sorted(turns, key=lambda t: (t.conv_id, t.turn_idx))
    assistant_ids = {i for i, t in enumerate(ordered) if t.role == "assistant"}

    got = [
        (r["doc_id"], r["score"])
        for r in ranked_search(
            spark_index,
            "the search engine",
            mode="bm25",
            k=10,
            doc_filter=role_tool_filter(spark_index, role="assistant"),
        ).collect()
    ]
    full = oracle_index.rank("the search engine", mode="bm25")
    want = [(d, s) for d, s in full if d in assistant_ids][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_bm25_floor_exercised(spark_index, oracle_index):
    # hot term 'the' has df close to N -> idf floor 0.1 must apply
    stats = spark_index.term_stats_for(["the"])
    df = stats["the"]["df"]
    n = spark_index.n_docs
    assert math.log((n - df + 0.5) / (df + 0.5)) < 0.1  # floor actually binds


def test_build_metrics_manifest(spark_index):
    m = spark_index.manifest
    assert set(m["stages"]) >= {"doc_stats", "corpus_stats", "postings", "term_stats"}
    metrics = m["metrics"]
    assert metrics["n_docs"] == spark_index.n_docs
    assert metrics["postings_per_sec"] > 0
    assert metrics["skew_ratio_max_df_over_avg_df"] >= 1.0
