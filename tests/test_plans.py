"""Physical-plan assertions: the properties that matter at 100 TB must
be visible in the executed plan, not just hoped for."""

import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.plans.build import build_index


@pytest.fixture(scope="module")
def index_path(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pidx") / "index")
    build_index(spark, corpus_df, path,
                EngineConfig(n_segments=8, n_buckets=8, resume=False),
                id_col="doc_id", n_groups=1)
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_buckets_and_terms(spark, index_path):
    from elasticsearch_osmosis_plugin_spark.operators.query import (
        _pruned_postings,
    )
    from elasticsearch_osmosis_plugin_spark.plans.build import load_meta

    meta = load_meta(index_path)
    plan = _plan(_pruned_postings(spark, index_path, ["public", "static"], meta))
    assert "PartitionFilters: [bucket" in plan          # dir-level pruning
    assert "PushedFilters: [In(term" in plan            # row-group pruning


def test_bm25_topk_is_take_ordered(spark, corpus_df):
    from elasticsearch_osmosis_plugin_spark.operators.bm25 import bm25_topk

    plan = _plan(bm25_topk(corpus_df, "public static", k=10))
    assert "TakeOrderedAndProject" in plan               # no global sort
    assert "BroadcastHashJoin" in plan                   # dims broadcast


def test_parquet_scan_projects_needed_columns_only(spark, index_path):
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    ds = catalog.read_table(spark, index_path, "docstats") \
        .select("doc_id", "dl")
    plan = _plan(ds)
    assert "ReadSchema: struct<doc_id:bigint,dl:int>" in plan


def test_topk_many_single_decode(spark, index_path):
    """The batched serving path's amortization claim, pinned in the
    plan: ONE MapInPandas decode for the whole batch (not one per
    query) and a broadcast fan-out of the (query_id, term) relation."""
    from elasticsearch_osmosis_plugin_spark.operators.query import topk_many

    df = topk_many(spark, index_path, {"a": "public static",
                                       "b": "static void",
                                       "c": "import"}, k=5)
    plan = _plan(df)
    assert plan.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in plan


def test_collapse_group_limit_below_exchange(spark, index_path):
    """Field collapsing's skew defense, pinned in the plan: the
    1-per-group cut runs as WindowGroupLimit partial+final (a
    mega-group ships one row per map partition, not its hit set) and
    the final k-cut is a TakeOrderedAndProject."""
    from elasticsearch_osmosis_plugin_spark.operators.scorefn import collapse_topk

    plan = _plan(collapse_topk(spark, index_path, "public static", "lang", k=5))
    assert plan.count("WindowGroupLimit") >= 2           # partial + final
    assert "TakeOrderedAndProject" in plan


def test_exact_filter_pushed_down(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.filter(docs.lang == "fr").select("doc_id"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,fr)]" in plan


def test_map_side_ops_have_no_exchange(spark):
    """The ops sold as map-side-only must show NO Exchange in the
    executed plan: percolate (unordered), stratified mixture sampling,
    and per-partition sequence packing."""
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        pack_sequences_partitioned,
        stratified_mixture,
    )
    from elasticsearch_osmosis_plugin_spark.operators.percolate import percolate

    docs = spark.createDataFrame(
        [(i, f"spark join t{i}", "en" if i % 2 else "de", 5)
         for i in range(50)],
        "doc_id long, text string, lang string, n_tokens long")
    p1 = _plan(percolate(docs, {"q": "spark join"}, analyzer="simple",
                         ordered=False))
    assert "Exchange" not in p1
    p2 = _plan(stratified_mixture(docs, {"en": 0.5}, stratum_col="lang"))
    assert "Exchange" not in p2
    p3 = _plan(pack_sequences_partitioned(docs, 64))
    assert "Exchange" not in p3
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        chunk_documents,
    )

    p4 = _plan(chunk_documents(docs, 8, ordered=False))
    assert "Exchange" not in p4


def test_classic_similarity_plan(spark, index_path):
    """topk_classic shares scoreall's physical shape: ONE Arrow decode
    and a TakeOrderedAndProject top-k (no global sort)."""
    from elasticsearch_osmosis_plugin_spark.operators.query import topk_classic

    plan = _plan(topk_classic(spark, index_path, "public static", k=10))
    assert plan.count("MapInPandas") == 1
    assert "TakeOrderedAndProject" in plan


def test_duplicate_spans_skew_safe_plan(spark):
    """Substring dedup plan shape, hot-gram-skew safe: the gram-hash
    group stats come from a map-side-combined groupBy (each partition
    contributes ONE partial row per hot gram) equi-joined back — NOT a
    window over the gram hash, which would pin every occurrence of a
    boilerplate gram in one unsplittable task. The only windows left
    are the per-doc island merge; the gram STRING never crosses an
    exchange (hashed before it)."""
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        duplicate_spans,
    )

    from elasticsearch_osmosis_plugin_spark.functions import dedupe

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(20)],
        "doc_id long, text string")
    # bypass the eager localCheckpoint so the full plan is inspectable
    orig = dedupe._materialized
    dedupe._materialized = lambda result, released: result
    try:
        out = duplicate_spans(docs, k=5)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        dedupe._materialized = orig
    final = plan.split("== Initial Plan ==")[0]   # AQE prints both plans
    # every Window operator partitions by doc_id, none by the gram hash
    import re

    for m in re.finditer(r"windowspecdefinition\((\w+)#", final):
        assert m.group(1) == "doc_id", final
    # group stats are partial-aggregated before the g exchange
    assert "partial_count" in final and "partial_min" in final
    assert "Exchange hashpartitioning(g#" in final
    # the gram hash (xxhash64) is computed below the exchanges: no raw
    # gram string column crosses a shuffle
    assert "xxhash64" in final


def test_round2b_operators_plan_shapes(spark, corpus_df, index_path,
                                       tmp_path_factory):
    """pinned / terms_subaggs / combined_fields / explain keep the
    shapes that matter at scale: top-k via TakeOrderedAndProject,
    small sides broadcast, NO sort-merge joins."""
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        terms_subaggs,
    )
    from elasticsearch_osmosis_plugin_spark.operators.query import (
        explain_hits,
        topk,
    )
    from elasticsearch_osmosis_plugin_spark.operators.scorefn import (
        combined_fields_topk,
        pinned_topk,
    )

    repo_idx = str(tmp_path_factory.mktemp("pidx2") / "index")
    build_index(spark, corpus_df, repo_idx,
                EngineConfig(n_segments=8, n_buckets=8, resume=False),
                id_col="doc_id", text_col="repo", n_groups=1)
    frames = {
        "pinned": pinned_topk(spark, index_path, [3, 5], "public", k=10),
        "subaggs": terms_subaggs(spark, index_path, "public", "lang",
                                 {"a": ("avg", "dl")}),
        "combined": combined_fields_topk(
            spark, {"content": index_path, "repo": repo_idx}, "public", k=10),
        "explain": explain_hits(
            spark, index_path, topk(spark, index_path, "public", k=5),
            "public"),
    }
    for name, df in frames.items():
        plan = _plan(df)
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        if name in ("pinned", "combined"):
            assert "TakeOrderedAndProject" in plan, name


def test_pq_adc_plan_is_narrow(spark):
    """PQ/ADC scoring is one codegen projection + TakeOrderedAndProject:
    no join, no shuffle exchange before the k-cut."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m=4, k_sub=8, seed=3)
    codes = pq_encode(emb, books)
    q = [r["embedding"] for r in emb.limit(1).collect()][0]
    plan = _plan(pq_topk_adc(codes, q, books, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1] \
        if "TakeOrderedAndProject" in plan else True


def test_linear_fuse_broadcasts_norm_constants(spark, index_path):
    """linear_fuse's per-source normalization constants must join by
    BROADCAST (they are one-row aggregates), never sort-merge."""
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.operators.scorefn import (
        linear_fuse,
    )

    x4 = lambda df: df.select(  # noqa: E731
        "doc_id", F.floor(F.col("score") * 10000.0 + F.lit(0.5))
        .cast("long").alias("score_x1e4"))
    a = x4(topk(spark, index_path, "public static", k=20))
    b = x4(topk(spark, index_path, "import", k=20))
    plan = _plan(linear_fuse({"a": a, "b": b}, {"a": 2.0}, k=10,
                             normalizer="minmax", window=20))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_terms_enum_is_metadata_only(spark, index_path):
    """terms_enum must scan the dictionary (5 stat columns), never a
    posting payload column."""
    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        terms_enum,
    )

    plan = _plan(terms_enum(spark, index_path, prefix="p", size=10))
    assert "doc_ids_vb" not in plan and "pos_vb" not in plan
    assert "StartsWith(term,p)" in plan.replace(" ", "") \
        or "PushedFilters" in plan
