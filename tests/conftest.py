from __future__ import annotations

import pytest

from search_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages(spark):
    """100-page synthetic corpus as a cached DataFrame (FIXTURES.md tiny)."""
    from search_engine_spark.sources.synth import synth_pages_df

    df = synth_pages_df(spark, 100).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_corpus_local():
    from search_engine_spark.sources.synth import synth_pages_local

    return synth_pages_local(100)
