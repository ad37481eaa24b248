"""Driver-contract smoke: entry() runs and yields rows with a stable schema;
queries()/oracle_sql() key sets agree.  The full Spark-vs-DuckDB value gate is
tools/check_gate.py (run at sf0.001 and sf0.01 before each commit touching
the entry surface)."""

import sys

sys.path.insert(0, "/root/repo")


def test_keys_match():
    import __spark_entry__ as m

    assert set(m.queries()) == set(m.oracle_sql())


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score_r"]


def test_gate_sample(spark):
    """One end-to-end spark-vs-duckdb value check per family (fast subset)."""
    import duckdb

    import __spark_entry__ as m

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = m.queries(), m.oracle_sql()
    for name in ("term_stats", "bool_phrase", "ranked_bm25", "quality_score", "ann_cosine_topk"):
        sdf = qs[name](spark, sf_dir)
        srows = sorted(tuple(r) for r in sdf.collect())
        drows = sorted(tuple(r) for r in con.sql(oracles[name]).fetchall())
        assert srows == drows, f"{name} mismatch"


def test_engine_cache_keys_on_application_id(spark):
    # a cache entry from another (stopped) session must be evicted, and a
    # recycled id(spark) can never alias a stale engine: the key is the
    # sessions's applicationId, not the interpreter id
    from searchengine_spark import engine_api
    from searchengine_spark.engine_api import _ENGINE_CACHE, documents_engine

    sf_dir = "/root/testdata/sf0.001"
    stale = object()  # stands in for an engine whose session is gone
    _ENGINE_CACHE.clear()
    _ENGINE_CACHE[("app-from-a-dead-session", sf_dir)] = stale

    eng = documents_engine(spark, sf_dir)
    app_id = spark.sparkContext.applicationId
    assert (app_id, sf_dir) in _ENGINE_CACHE
    assert all(k[0] == app_id for k in _ENGINE_CACHE), "stale entry not evicted"
    assert documents_engine(spark, sf_dir) is eng  # same session -> cached
