"""M3 compaction + block-max pruning: results must be identical to the
unmerged / unpruned paths (SURVEY M3 gate: merged index answers ==
M1 answers)."""

import os

import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators.bm25 import bm25_oracle
from elasticsearch_osmosis_plugin_spark.operators.query import topk
from elasticsearch_osmosis_plugin_spark.plans.build import build_index, load_meta
from elasticsearch_osmosis_plugin_spark.plans.merge import (
    compact_index,
    drop_unmerged_groups,
)

CFG = EngineConfig(n_segments=8, n_buckets=4, block_size=8)


@pytest.fixture(scope="module")
def index_path(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("midx") / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=4)
    return path


def _oracle(corpus_rows, query, k):
    rows = list(zip(corpus_rows["doc_id"], corpus_rows["content"]))
    return bm25_oracle(rows, query, k=k)


def test_blockmax_single_term_rank_identical(spark, corpus_rows, index_path):
    # block_size=8 -> many blocks; pruning path must stay exact
    for query in ("id0001", "public", "id0042"):
        got = topk(spark, index_path, query, k=10, strategy="blockmax").collect()
        want = _oracle(corpus_rows, query, 10)
        assert [r["doc_id"] for r in got] == [d for d, _ in want], query
        for r, (_, s) in zip(got, want):
            assert abs(r["score"] - s) < 1e-9


def test_compaction_preserves_results(spark, corpus_rows, index_path):
    before = topk(spark, index_path, "id0001 import", k=10).collect()
    meta = compact_index(spark, index_path)
    assert meta["merged"] is True
    assert os.path.exists(os.path.join(index_path, "postings_merged"))
    after = topk(spark, index_path, "id0001 import", k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in before] == \
           [(r["doc_id"], round(r["score"], 9)) for r in after]
    # merged layout: exactly one data file per bucket
    for b in range(CFG.n_buckets):
        d = os.path.join(index_path, "postings_merged", f"bucket={b}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_drop_unmerged_groups(spark, corpus_rows, index_path):
    drop_unmerged_groups(index_path)
    assert not os.path.exists(os.path.join(index_path, "postings", "group=0"))
    got = topk(spark, index_path, "public static", k=5).collect()
    want = _oracle(corpus_rows, "public static", 5)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_meta_merge_lineage(index_path):
    meta = load_meta(index_path)
    assert any(m["stage"] == "merge" for m in meta["metrics"])


def test_verify_index_fsck(spark, corpus_df, tmp_path):
    """Integrity audit: clean index passes every check; a tampered
    source flips the sha row-invariant; a deleted postings group flips
    the dictionary consistency check."""
    import shutil

    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.plans.build import build_index
    from elasticsearch_osmosis_plugin_spark.plans.merge import verify_index

    path = str(tmp_path / "fsck")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=2)
    rep = verify_index(spark, path, corpus_df)
    assert rep["ok"] and rep["row_invariant"]["ok"] \
        and rep["dictionary"]["ok"] and rep["doc_lengths"]["ok"], rep

    tampered = corpus_df.withColumn(
        "content", F.when(F.col("doc_id") == 3, F.lit("EVIL"))
        .otherwise(F.col("content")))
    rep2 = verify_index(spark, path, tampered)
    assert not rep2["ok"] and rep2["row_invariant"]["mismatches"] == 1

    shutil.rmtree(os.path.join(path, "postings", "group=1"))
    rep3 = verify_index(spark, path)
    assert not rep3["ok"] and not rep3["structure"]["ok"] \
        and not rep3["dictionary"]["ok"]
