"""T8 pluggable language pipelines: registry dispatch, the english default's
equivalence to the expression tokenizer, and the Spanish-shaped kernel
plumbing via a deterministic lemmatizer double (spaCy itself is absent in
this container — make_spacy_spanish_pipeline raises ImportError, also
asserted here)."""

import pytest


def test_english_pipeline_is_default_tokenizer(spark):
    from searchengine_spark.text.pipelines import tokenize_language
    from searchengine_spark.text.spark_tokenize import tokenize

    docs = spark.createDataFrame(
        [(0, "Running state-of-the-art searches"), (1, "the lazy dog")],
        "doc_id long, text string",
    )
    got = {tuple(r) for r in tokenize_language(docs, "english").collect()}
    want = {tuple(r) for r in tokenize(docs).collect()}
    assert got == want


def test_unknown_language_raises(spark):
    from searchengine_spark.text.pipelines import tokenize_language

    docs = spark.createDataFrame([(0, "hola")], "doc_id long, text string")
    with pytest.raises(ValueError, match="Unsupported language"):
        tokenize_language(docs, "klingon")


def test_spacy_pipeline_raises_without_spacy():
    from searchengine_spark.text.pipelines import make_spacy_spanish_pipeline

    with pytest.raises(ImportError, match="spaCy is not installed"):
        make_spacy_spanish_pipeline()


LEMMAS = {"corriendo": "correr", "gatos": "gato", "perros": "perro"}


@pytest.fixture(autouse=True)
def _spanish_double():
    from searchengine_spark.text.pipelines import (
        make_lemma_kernel_pipeline,
        register_language_pipeline,
    )

    register_language_pipeline(
        "spanish_double",
        make_lemma_kernel_pipeline(
            tokenize_fn=lambda t: t.split(),
            lemma_fn=lambda t: LEMMAS.get(t, t),
            is_alpha_fn=str.isalpha,
        ),
    )


def test_lemma_kernel_double_spanish_shape(spark):
    """The exact processor shape of spanishtokenprocessor.py:9-27 with a
    deterministic double: whitespace tokenize, is_alpha filter (positions
    count every non-empty token), strip non-alnum + lower, dict lemma."""
    from searchengine_spark.text.pipelines import tokenize_language

    docs = spark.createDataFrame(
        [(0, "Gatos corriendo 123 y Perros"), (1, "")], "doc_id long, text string"
    )
    rows = sorted(
        tokenize_language(docs, "spanish_double").collect(),
        key=lambda r: (r["doc_id"], r["position"]),
    )
    # "123" occupies position 3 but is filtered (is_alpha), like spaCy's
    # token stream emitting every token while the processor drops non-alpha
    assert [(r["doc_id"], r["position"], r["term"]) for r in rows] == [
        (0, 1, "gato"),
        (0, 2, "correr"),
        (0, 4, "y"),
        (0, 5, "perro"),
    ]


def test_lemma_kernel_feeds_build(spark, tmp_path):
    """A non-english pipeline's token stream drops into the standard build
    contract (doc_id, position, term)."""
    from searchengine_spark.text.pipelines import tokenize_language

    docs = spark.createDataFrame(
        [(0, "gatos y perros"), (1, "perros corriendo")], "doc_id long, text string"
    )
    toks = tokenize_language(docs, "spanish_double")
    assert toks.columns == ["doc_id", "position", "term"]
    from searchengine_spark.indexing.logical import postings_all_table

    postings = {(r["term"], r["doc_id"]) for r in postings_all_table(toks).collect()}
    assert ("perro", 0) in postings and ("perro", 1) in postings


def test_spanish_lite_registered_and_lemmatizes(spark):
    from searchengine_spark.text.pipelines import (
        available_languages,
        spanish_lite_lemma,
        tokenize_language,
    )

    assert "spanish-lite" in available_languages()
    # rule spot checks (ordered rules)
    assert spanish_lite_lemma("es") == "ser"  # irregular beats suffix rules
    assert spanish_lite_lemma("rápidamente") == "rápida"
    assert spanish_lite_lemma("naciones") == "nación"
    assert spanish_lite_lemma("luces") == "luz"
    assert spanish_lite_lemma("flores") == "flor"
    assert spanish_lite_lemma("casas") == "casa"
    assert spanish_lite_lemma("sol") == "sol"

    docs = spark.createDataFrame(
        [(0, "Las naciones   tienen ciudades grandes"), (1, "el sol 123 no-alpha es brillante")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["position"], r["term"])
            for r in tokenize_language(docs, "spanish-lite").collect()}
    # positions count non-empty tokens; non-alpha tokens burn a position
    assert (0, 1, "las") in rows         # len<=3: plural rule does not fire
    assert (0, 2, "nación") in rows
    assert (0, 3, "tener") in rows       # irregular
    assert (0, 4, "ciudade") in rows or (0, 4, "ciudad") in rows
    assert not any(d == 1 and t in ("123", "no-alpha", "noalpha") for d, _p, t in rows)
    assert (1, 5, "ser") in rows         # '123'/'no-alpha' burn positions 3-4


def test_spanish_lite_matches_duck_oracle(spark):
    """The gate check in miniature: Spark pipeline vs the independent SQL
    rule implementation over the sf0.001 documents table."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as e

    sdf = e.q_tokenize_spanish_lite(spark, "/root/testdata/sf0.001").toPandas()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'")
    odf = con.sql(e.oracle_sql()["tokenize_spanish_lite"]).df()
    cols = ["doc_id", "position", "term"]
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
