"""Cavnar-Trenkle trigram language ID (pipeline/langid_ngram.py): the Arrow
kernel, the expression plan and the DuckDB twin must agree bit-for-bit, and
the classifier must succeed on text where the marker-stopword heuristic
(textops.lang_id) fails."""

import duckdb
import pytest

# texts deliberately avoiding every marker word of textops.lang_id
# (en: the/a/of/and/to/in; es: el/la/de/que/los/y; de: der/die/das/und/ist/ein)
FIXTURES = [
    (0, "ayer caminamos por las calles antiguas mientras sonaba musica lejana", "es"),
    (1, "gestern gingen wir durch alte gassen waehrend ferne musik erklang", "de"),
    (2, "hier nous avons marche dans les vieilles rues pendant que jouait une musique lointaine", "fr"),
    (3, "yesterday we walked through old streets while distant music played", "en"),
    (4, "", "unknown"),
    (5, "1234 --- !!!", "unknown"),
    (6, "esta manana compramos pan fresco para toda nuestra familia", "es"),
    (7, "heute morgen kauften wir frisches brot fuer unsere ganze familie", "de"),
]


def test_classify_text_beats_marker_heuristic():
    from searchengine_spark.pipeline import classify_text

    for _, text, want in FIXTURES:
        assert classify_text(text) == want, text


def test_marker_heuristic_actually_fails_on_these():
    # the fixtures are only meaningful if the old heuristic gets them wrong
    from searchengine_spark.pipeline import classify_text, lang_id

    non_en = [f for f in FIXTURES if f[2] in ("es", "de", "fr")]
    assert len(non_en) >= 4
    # marker heuristic has no marker hits -> 'unknown' for all of them
    # (checked via the spark plan in test_kernel_matches_expr_and_sql)


def test_profiles_are_deterministic_and_sized():
    from searchengine_spark.pipeline.langid_ngram import PROFILE_SIZE, language_profiles

    p1 = language_profiles()
    p2 = language_profiles()
    assert p1 == p2
    assert set(p1) == {"en", "es", "de", "fr"}
    for lang, prof in p1.items():
        assert len(prof) == PROFILE_SIZE, lang
        assert set(prof.values()) == set(range(1, PROFILE_SIZE + 1))


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in FIXTURES], "doc_id long, text string"
    )


def test_kernel_matches_expr_and_sql(spark, fixture_docs):
    from searchengine_spark.duck_oracle import sql_lang_id_ngram
    from searchengine_spark.pipeline import lang_id, lang_id_ngram, lang_id_ngram_expr

    kernel = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(fixture_docs).collect()}
    expr = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram_expr(fixture_docs).collect()}
    assert kernel == expr

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES {}) t(doc_id, text)".format(
        ", ".join(f"({i}, '{t}')" for i, t, _ in FIXTURES)
    ))
    sql = dict(con.execute(sql_lang_id_ngram()).fetchall())
    assert kernel == sql

    # and the old marker heuristic is blind on the non-English fixtures
    docs3 = fixture_docs.withColumn("lang", fixture_docs.text.substr(1, 0))
    marker = {r["doc_id"]: r["lang_pred"] for r in lang_id(fixture_docs).collect()}
    for i, _, want in FIXTURES:
        if want in ("es", "de", "fr"):
            assert marker[i] != want  # heuristic fails where the classifier succeeds


def test_kernel_matches_expr_on_corpus(spark):
    from searchengine_spark.pipeline import lang_id_ngram, lang_id_ngram_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    kernel = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(docs).collect()}
    expr = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram_expr(docs).collect()}
    assert kernel == expr and len(kernel) == 120


def test_kernel_plan_has_no_shuffle(spark):
    from searchengine_spark.pipeline import lang_id_ngram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = lang_id_ngram(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # one narrow Arrow pass
