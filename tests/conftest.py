from __future__ import annotations

import pytest

from elasticsearch_osmosis_plugin_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="eosp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    """Deterministic 80-doc synthetic source-code corpus as python rows."""
    from elasticsearch_osmosis_plugin_spark.corpus import generate_corpus_pdf

    pdf = generate_corpus_pdf(seed=42, n=80)
    pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    return pdf


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows)
