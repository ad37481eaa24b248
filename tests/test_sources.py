"""File-corpus sources (SURVEY.md §2 S1-S3): extension dispatch, title
extraction, dense path-ordered docIDs — the DirectoryCorpus contract."""

import json

import pytest


TEI_XML = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
  <head><title>Delta Title</title></head>
  <text><body>
    <p>first paragraph text</p>
    <p>second paragraph here</p>
  </body></text>
</TEI>"""


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "alpha.txt").write_text("the quick brown fox\njumps over the lazy dog\n")
    (d / "beta.txt").write_text("running runner ran\n")
    (d / "gamma.json").write_text(json.dumps({"title": "Gamma Doc", "body": "spark shuffle partition"}))
    (d / "delta.xml").write_text(TEI_XML)
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


def test_xml_corpus_title_priority_and_content(spark, corpus_dir):
    from searchengine_spark.sources import read_xml_corpus

    rows = read_xml_corpus(spark, corpus_dir).collect()
    assert len(rows) == 1
    assert rows[0]["title"] == "Delta Title"  # ./tei:head/tei:title wins
    # all-element text in document order, newline-joined, whitespace-only
    # element texts dropped (xmldocument.py:43-47)
    assert rows[0]["text"].splitlines() == [
        "Delta Title",
        "first paragraph text",
        "second paragraph here",
    ]


def test_directory_corpus_dense_path_ordered_ids(spark, corpus_dir):
    from searchengine_spark.sources import read_directory_corpus

    rows = sorted(read_directory_corpus(spark, corpus_dir).collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]
    # path sort: alpha.txt < beta.txt < delta.xml < gamma.json — mixed
    # extensions keep one dense id space
    assert [r["title"] for r in rows] == ["alpha", "beta", "Delta Title", "Gamma Doc"]


def test_directory_corpus_feeds_build(spark, corpus_dir, tmp_path):
    from searchengine_spark.indexing import SparkIndex, build_index
    from searchengine_spark.querying.ranked import ranked_search
    from searchengine_spark.sources import read_directory_corpus

    docs = read_directory_corpus(spark, corpus_dir)
    out = str(tmp_path / "file_index")
    build_index(spark, docs, out)
    idx = SparkIndex(spark, out)
    assert idx.n_docs == 4
    top = ranked_search(idx, "fox", k=3).collect()
    assert top and top[0]["doc_id"] == 0


def test_directory_corpus_missing_formats_tolerated(spark, tmp_path):
    """Only absent formats are skipped; real failures propagate."""
    d = tmp_path / "txt_only"
    d.mkdir()
    (d / "solo.txt").write_text("just one text file\n")
    from searchengine_spark.sources import read_directory_corpus

    rows = read_directory_corpus(spark, str(d)).collect()
    assert [r["title"] for r in rows] == ["solo"]


def test_directory_corpus_corrupt_json_propagates(spark, tmp_path):
    d = tmp_path / "badjson"
    d.mkdir()
    (d / "ok.txt").write_text("fine\n")
    (d / "bad.json").write_text('{"no_title_or_body": 1}')
    from searchengine_spark.sources import read_directory_corpus

    with pytest.raises(Exception) as ei:
        read_directory_corpus(spark, str(d)).collect()
    assert "PATH_NOT_FOUND" not in str(ei.value)
