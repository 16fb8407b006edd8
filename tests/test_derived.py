"""Derived-index builder chain (SURVEY A24): sequential run, lineage,
abort-on-first-failure."""

import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.build import build_index
from elasticsearch_osmosis_plugin_spark.plans.derived import (
    DerivedIndexError,
    register,
    run_derived_builders,
)


@pytest.fixture(scope="module")
def index_path(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("didx") / "index")
    build_index(spark, corpus_df, path,
                EngineConfig(n_segments=4, n_buckets=4, resume=False),
                id_col="doc_id", n_groups=1)
    return path


def test_builtin_builders(spark, index_path, corpus_df):
    lineage = run_derived_builders(spark, index_path,
                                   ["lang_stats", "hot_terms"])
    assert [r["builder"] for r in lineage] == ["lang_stats", "hot_terms"]
    langs = catalog.read_table(spark, index_path, "derived/lang_stats")
    assert (sum(r["n_docs"] for r in langs.collect())
            == corpus_df.count())
    hot = catalog.read_table(spark, index_path, "derived/hot_terms").collect()
    assert hot[0]["df"] >= hot[-1]["df"]


def test_chain_aborts_on_first_failure(spark, index_path):
    calls = []

    @register("t_ok")
    def ok(spark_, path, cfg):
        calls.append("ok")

    @register("t_boom")
    def boom(spark_, path, cfg):
        raise ValueError("boom")

    @register("t_never")
    def never(spark_, path, cfg):
        calls.append("never")

    with pytest.raises(DerivedIndexError, match="aborted at 't_boom'"):
        run_derived_builders(spark, index_path, ["t_ok", "t_boom", "t_never"])
    assert calls == ["ok"]


def test_dotted_path_resolution(spark, index_path):
    # reflection analog: load a builder by dotted import path
    lineage = run_derived_builders(
        spark, index_path,
        ["elasticsearch_osmosis_plugin_spark.plans.derived.build_lang_stats"])
    assert len(lineage) == 1


def test_unknown_builder(spark, index_path):
    with pytest.raises(DerivedIndexError):
        run_derived_builders(spark, index_path, ["nope"])
