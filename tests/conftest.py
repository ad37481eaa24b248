import pytest


@pytest.fixture(autouse=True)
def _drain_docid_caches():
    """Release any docID caches a test leaked (advisor round-4): without
    this, one leaky test silently breaks the next test's single-producer
    drain assumption in IndexBuilder (len(_DOCID_CACHES) == 1)."""
    yield
    from searchengine_spark.indexing.build import release_docid_caches

    release_docid_caches()


@pytest.fixture(scope="session")
def spark():
    from searchengine_spark.session import get_spark

    spark = get_spark(app_name="searchengine_spark_tests", cpus=4, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def turns():
    from searchengine_spark.data import generate_turns

    return generate_turns(n_convs=60, seed=42)


@pytest.fixture(scope="session")
def oracle_index(turns):
    from searchengine_spark.data import docs_in_stable_order
    from searchengine_spark.oracle import build_oracle_index

    return build_oracle_index(docs_in_stable_order(turns))


@pytest.fixture(scope="session")
def transcripts_df(spark, turns):
    from searchengine_spark.data import spark_schema, turns_as_rows

    return spark.createDataFrame(turns_as_rows(turns), schema=spark_schema())


@pytest.fixture(scope="session")
def index_dir(tmp_path_factory, spark, transcripts_df):
    from searchengine_spark.indexing import build_index, prepare_transcripts

    out = str(tmp_path_factory.mktemp("index"))
    docs = prepare_transcripts(transcripts_df)
    build_index(spark, docs, out)
    return out


@pytest.fixture(scope="session")
def spark_index(spark, index_dir):
    from searchengine_spark.indexing import SparkIndex

    return SparkIndex(spark, index_dir)
