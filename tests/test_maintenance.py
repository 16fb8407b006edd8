"""_delete_by_query / _update_by_query / _reindex / significant_text /
_mtermvectors — the ES maintenance surface over the persisted index."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators import intersect
from elasticsearch_osmosis_plugin_spark.operators.query import (
    delete_by_query,
    reindex,
    scan_df,
    topk,
    update_by_query,
)
from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.build import build_index, load_meta

CFG = EngineConfig(n_segments=4, n_buckets=4, block_size=16)


@pytest.fixture()
def mut_index(spark, corpus_df, tmp_path):
    """Function-scoped: these tests mutate the index."""
    path = str(tmp_path / "mutidx")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


def test_delete_by_query(spark, mut_index):
    want = {r["doc_id"] for r in
            intersect.match_any_terms(spark, mut_index, "id0042").collect()}
    assert want
    n = delete_by_query(spark, mut_index, "id0042")
    assert n == len(want)
    assert intersect.match_any_terms(spark, mut_index, "id0042").count() == 0
    # survivors still queryable; deleted ids gone from every path
    alive = {r["doc_id"] for r in scan_df(spark, mut_index).collect()}
    assert alive and not (alive & want)
    # idempotent: nothing new to delete
    assert delete_by_query(spark, mut_index, "id0042") == 0
    # post_filter-only delete (match_all + predicate)
    java = {r["doc_id"] for r in
            catalog.read_table(spark, mut_index, "docstats")
            .filter(F.col("lang") == "java").select("doc_id").collect()}
    n2 = delete_by_query(spark, mut_index, None,
                         post_filter=F.col("lang") == "java")
    assert n2 == len(java - want)


def test_update_by_query(spark, mut_index):
    hit = {r["doc_id"] for r in
           intersect.match_any_terms(spark, mut_index, "id0042").collect()}
    n = update_by_query(spark, mut_index,
                        {"repo": "concat(repo, '-hit')",
                         "lang": "upper(lang)"},
                        "id0042")
    assert n == len(hit) > 0
    ds = catalog.read_table(spark, mut_index, "docstats")
    for r in ds.select("doc_id", "repo", "lang").collect():
        assert r["repo"].endswith("-hit") == (r["doc_id"] in hit)
        assert (r["lang"] == r["lang"].upper()) == (r["doc_id"] in hit) \
            or r["lang"] is None
    # manifest survived the swap (term vectors still advertised)
    assert catalog.read_manifest(mut_index, "docstats")["term_vectors"]
    assert catalog.read_manifest(
        mut_index, "docstats")["updated_by_query"] == n
    # queries still run after the docstats rewrite
    assert topk(spark, mut_index, "public static", k=5).count() == 5
    with pytest.raises(ValueError):
        update_by_query(spark, mut_index, {"dl": "dl + 1"}, "id0042")
    with pytest.raises(ValueError):
        update_by_query(spark, mut_index, {"nope": "1"}, "id0042")


def test_reindex_full_and_filtered(spark, mut_index, tmp_path):
    dest = str(tmp_path / "re_full")
    meta = reindex(spark, mut_index, dest)
    assert meta["n_docs"] == load_meta(mut_index)["n_docs"]
    for q in ["public static", "id0042 id0007", "getIndexBuffer"]:
        src_ids = [r["doc_id"] for r in
                   topk(spark, mut_index, q, k=10).collect()]
        dst_ids = [r["doc_id"] for r in topk(spark, dest, q, k=10).collect()]
        assert src_ids == dst_ids, q
    # tombstoned docs are dropped for real in the new index
    n_del = delete_by_query(spark, mut_index, "id0042")
    dest2 = str(tmp_path / "re_live")
    meta2 = reindex(spark, mut_index, dest2)
    assert meta2["n_docs"] == meta["n_docs"] - n_del
    assert intersect.match_any_terms(spark, dest2, "id0042").count() == 0
    assert not meta2.get("tombstones_n")
    # query-filtered reindex: the new corpus IS the hit subset
    dest3 = str(tmp_path / "re_sub")
    want = {r["doc_id"] for r in
            scan_df(spark, mut_index, "public").collect()}
    meta3 = reindex(spark, mut_index, dest3, query="public")
    assert meta3["n_docs"] == len(want)
    got = {r["doc_id"] for r in scan_df(spark, dest3).collect()}
    assert got == want


def test_significant_text_dedups_boilerplate(spark, tmp_path):
    """50 copies of a boilerplate hit inflate significant_terms but
    count once under significant_text's filter_duplicate_text."""
    boiler = "apple banana cherry"
    rows = [(i, boiler) for i in range(50)] \
        + [(100 + i, f"apple distinct{i} word{i % 3}") for i in range(6)] \
        + [(200 + i, f"other text{i} banana") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    path = str(tmp_path / "sigidx")
    build_index(spark, df, path, EngineConfig(
        analyzer="simple", n_segments=2, n_buckets=2, block_size=16),
        id_col="doc_id", n_groups=1)
    st = {r["term"]: r for r in intersect.significant_terms(
        spark, path, "apple", size=50, min_doc_count=1).collect()}
    sx = {r["term"]: r for r in intersect.significant_text(
        spark, path, "apple", size=50, min_doc_count=1).collect()}
    # the boilerplate group collapses to ONE foreground doc
    assert st["cherry"]["df_fg"] == 50
    assert sx["cherry"]["df_fg"] == 1
    # fg universe: 50 dups -> 1, plus the 6 distinct docs
    assert sx["apple"]["df_fg"] == 7
    # dedup off == significant_terms exactly
    raw = {r["term"]: tuple(r) for r in intersect.significant_text(
        spark, path, "apple", size=50, min_doc_count=1,
        filter_duplicate_text=False).collect()}
    assert raw == {r["term"]: tuple(r) for r in
                   intersect.significant_terms(
                       spark, path, "apple", size=50,
                       min_doc_count=1).collect()}


def test_mtermvectors_matches_solo(spark, mut_index):
    solo7 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
             for r in intersect.term_vectors(spark, mut_index, 7).collect()]
    solo9 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
             for r in intersect.term_vectors(spark, mut_index, 9).collect()]
    got = intersect.mtermvectors(spark, mut_index, [7, 9, 10**9]).collect()
    got7 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
            for r in got if r["doc_id"] == 7]
    got9 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
            for r in got if r["doc_id"] == 9]
    assert got7 == solo7 and got9 == solo9
    assert {r["doc_id"] for r in got} == {7, 9}


def test_rollover(spark, corpus_df, tmp_path):
    from elasticsearch_osmosis_plugin_spark.plans.catalog import (
        resolve_alias,
        rollover,
    )
    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat

    base = str(tmp_path / "logs-000001")
    alias = str(tmp_path / "logs_write")
    build_index(spark, corpus_df, base, CFG, id_col="doc_id", n_groups=1)
    cat.create_alias(alias, base)
    # below threshold: no roll
    r = rollover(alias, max_docs=10**6)
    assert not r["rolled_over"] and r["new_index"] is None
    assert resolve_alias(alias) == base
    # over threshold: new generation, alias repointed, old untouched
    r = rollover(alias, max_docs=10)
    assert r["rolled_over"] and r["new_index"].endswith("logs-000002")
    assert resolve_alias(alias) == r["new_index"]
    assert topk(spark, base, "public static", k=5).count() == 5
    # the fresh generation is empty until something builds into it
    r2 = rollover(alias, max_docs=10)
    assert not r2["rolled_over"]
    # building through the alias materializes generation 2
    build_index(spark, corpus_df.limit(20), alias, CFG,
                id_col="doc_id", n_groups=1)
    assert load_meta(alias)["n_docs"] == 20
    assert topk(spark, alias, "public", k=3).count() >= 1
    assert load_meta(base)["n_docs"] == corpus_df.count()
    with pytest.raises(FileNotFoundError):
        rollover(base, max_docs=1)  # not an alias
