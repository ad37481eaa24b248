"""File-corpus sources (SURVEY.md §2 S1-S3): extension dispatch, title
extraction, dense path-ordered docIDs — the DirectoryCorpus contract."""

import json

import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "alpha.txt").write_text("the quick brown fox\njumps over the lazy dog\n")
    (d / "beta.txt").write_text("running runner ran\n")
    (d / "gamma.json").write_text(json.dumps({"title": "Gamma Doc", "body": "spark shuffle partition"}))
    return str(d)


def test_text_corpus_titles_and_content(spark, corpus_dir):
    from searchengine_spark.sources import read_text_corpus

    rows = {r["title"]: r["text"] for r in read_text_corpus(spark, corpus_dir).collect()}
    assert set(rows) == {"alpha", "beta"}
    assert "quick brown fox" in rows["alpha"]
    assert rows["alpha"].count("\n") >= 1  # wholetext keeps all lines


def test_json_corpus_fields(spark, corpus_dir):
    from searchengine_spark.sources import read_json_corpus

    rows = read_json_corpus(spark, corpus_dir).collect()
    assert len(rows) == 1
    assert rows[0]["title"] == "Gamma Doc"
    assert rows[0]["text"] == "spark shuffle partition"


def test_directory_corpus_dense_path_ordered_ids(spark, corpus_dir):
    from searchengine_spark.sources import read_directory_corpus

    rows = sorted(read_directory_corpus(spark, corpus_dir).collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    # path sort: alpha.txt < beta.txt < gamma.json
    assert [r["title"] for r in rows] == ["alpha", "beta", "Gamma Doc"]


def test_directory_corpus_feeds_build(spark, corpus_dir, tmp_path):
    from searchengine_spark.indexing import SparkIndex, build_index
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.sources import read_directory_corpus

    docs = read_directory_corpus(spark, corpus_dir)
    out = str(tmp_path / "file_index")
    build_index(spark, docs, out)
    idx = SparkIndex(spark, out)
    assert idx.n_docs == 3
    top = ranked_search(idx, "fox", k=3).collect()
    assert top and top[0]["doc_id"] == 0
