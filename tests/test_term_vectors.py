"""Term-vector doc store: tokens staged columnar in docstats feed the
postings groups (one tokenize per corpus), can be reclaimed with
drop_term_vectors, and a reclaimed store forces re-tokenization on the
next resumed build instead of silently failing."""

import os

from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py
from elasticsearch_osmosis_plugin_spark.operators.query import topk
from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.build import build_index
from elasticsearch_osmosis_plugin_spark.plans.merge import drop_term_vectors

CFG = EngineConfig(n_segments=8, n_buckets=4, block_size=16)


def test_docstats_tokens_match_analyzer(spark, corpus_df, corpus_rows, tmp_path):
    path = str(tmp_path / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=2)
    ds = catalog.read_table(spark, path, "docstats")
    got = {r["doc_id"]: r["tokens"]
           for r in ds.select("doc_id", "tokens").collect()}
    for d, t in zip(corpus_rows["doc_id"], corpus_rows["content"]):
        assert got[d] == tokenize_py(t, "code"), d


def test_drop_term_vectors_then_resume(spark, corpus_df, tmp_path):
    path = str(tmp_path / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=2)
    before = topk(spark, path, "id0001", k=5).collect()

    drop_term_vectors(spark, path)
    ds = catalog.read_table(spark, path, "docstats")
    assert "tokens" not in ds.columns
    assert ds.count() == corpus_df.count()  # doc store itself intact

    # resumed build re-tokenizes (docstats rebuilt with term vectors)
    # and invalidates + rebuilds the postings groups
    g0_mtime = os.path.getmtime(os.path.join(path, "postings", "group=0"))
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=2)
    assert "tokens" in catalog.read_table(spark, path, "docstats").columns
    assert os.path.getmtime(os.path.join(path, "postings", "group=0")) != g0_mtime
    after = topk(spark, path, "id0001", k=5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in before] == \
           [(r["doc_id"], round(r["score"], 9)) for r in after]


def test_group_read_is_partition_pruned(spark, corpus_df, tmp_path):
    """The per-group scan of the term-vector store must prune to its
    grp= directory (not rescan the whole corpus per group)."""
    path = str(tmp_path / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=2)
    ds = catalog.read_table(spark, path, "docstats")
    plan = ds.filter(F.col("grp") == 1).select("doc_id", "dl", "tokens") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(grp" in plan and "= 1)]" in plan
    # and column pruning: content_sha etc. never read by the group scan
    assert "content_sha" not in plan.split("ReadSchema:")[1]
