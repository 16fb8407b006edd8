"""Dedup + similarity operators: golden semantics on hand-built
fixtures and agreement between exact and LSH paths."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),        # near dup
        (4, "completely different words entirely here now folks"),
        (5, "the  QUICK   brown fox jumps over the lazy dog"),     # ws/case dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(spark, docs):
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        exact_duplicate_groups,
    )

    got = exact_duplicate_groups(docs).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 3          # 1, 2, 5 normalize identically
    assert got[0]["keep_doc_id"] == 1


def test_ngram_jaccard(spark, docs):
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        ngram_jaccard_pairs,
    )

    got = {(r["doc_a"], r["doc_b"]): r["jaccard_x1e4"]
           for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    assert got[(1, 2)] == 10000           # identical shingle sets
    assert got[(1, 5)] == 10000
    assert 3000 <= got[(1, 3)] < 10000    # near dup
    assert (1, 4) not in got


def test_minhash_lsh_finds_near_dups(spark, docs):
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        minhash_lsh_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs, n_hashes=8, band_size=2).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert (1, 4) not in pairs


def test_simhash_identical_docs_equal(spark, docs):
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import simhash

    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got[1] == got[2] == got[5]
    assert got[1] != got[4]


def test_simhash_neardup_pairs(spark, docs):
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        simhash_neardup_pairs,
    )

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_neardup_pairs(docs, max_hamming=7).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs
    with pytest.raises(ValueError):
        simhash_neardup_pairs(docs, max_hamming=20)


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [(0, base.tolist(), 0)]
    rows.append((1, (base + 0.01 * rng.standard_normal(16)).tolist(), 0))  # near dup
    for i in range(2, 40):
        rows.append((i, rng.standard_normal(16).tolist(), 1))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_cosine_topk_exact(spark, embeddings):
    from elasticsearch_osmosis_plugin_spark.functions.similarity import cosine_topk

    q = embeddings.filter("vec_id = 0").collect()[0]["embedding"]
    got = cosine_topk(embeddings, q, k=3).collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["cos"] - 1.0) < 1e-12
    assert got[1]["vec_id"] == 1          # the near dup ranks second


def test_ann_lsh_agrees_with_bruteforce_on_top1(spark, embeddings):
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        ann_topk_lsh,
        cosine_topk,
    )

    q = embeddings.filter("vec_id = 0").collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q, k=3).collect()]
    approx = [r["vec_id"] for r in
              ann_topk_lsh(embeddings, q, k=3, n_planes=4,
                           multiprobe_hamming=1).collect()]
    # near-identical vectors share the query's bucket: top-2 must appear
    assert exact[0] in approx and exact[1] in approx


def test_ann_ivf_agrees_with_bruteforce_on_top2(spark, embeddings):
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        ann_topk_ivf,
        cosine_topk,
        ivf_centroids,
    )

    q = embeddings.filter("vec_id = 0").collect()[0]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(embeddings, q, k=3).collect()]
    cents = ivf_centroids(embeddings, n_lists=4, sample_n=64)
    approx = [r["vec_id"] for r in
              ann_topk_ivf(embeddings, q, k=3, n_lists=4, n_probe=2,
                           cents=cents).collect()]
    # the query vector and its planted near-dup land in the same (or a
    # probed) list: top-2 must appear
    assert exact[0] in approx and exact[1] in approx
    # determinism: retrained quantizer is bit-identical
    cents2 = ivf_centroids(embeddings, n_lists=4, sample_n=64)
    assert (cents == cents2).all()


def test_neardup_lsh_precision_vs_exact(spark, embeddings):
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        neardup_pairs_exact,
        neardup_pairs_lsh,
    )

    exact = {(r["vec_a"], r["vec_b"]) for r in
             neardup_pairs_exact(embeddings, threshold=0.99).collect()}
    lsh = {(r["vec_a"], r["vec_b"]) for r in
           neardup_pairs_lsh(embeddings, threshold=0.99, n_planes=4).collect()}
    assert (0, 1) in exact
    assert lsh <= exact                    # exact precision
    assert (0, 1) in lsh                   # recall on the planted dup


def test_persisted_ann_layouts_prune_partitions(spark, tmp_path):
    """Precompute-at-ingest ANN: results identical to the in-flight
    variants, and the probe read is PARTITION-pruned (the executed plan
    carries PartitionFilters on the probe buckets/lists)."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_persisted,
        ann_topk_lsh,
        ann_topk_lsh_persisted,
        write_ivf_layout,
        write_lsh_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.filter("vec_id = 0").select("embedding").collect()[0][0])

    lsh_path = str(tmp_path / "lsh_layout")
    write_lsh_layout(emb, lsh_path, n_planes=6)
    got = ann_topk_lsh_persisted(spark, lsh_path, q, k=10, multiprobe_hamming=1)
    want = ann_topk_lsh(emb, q, k=10, n_planes=6, multiprobe_hamming=1)
    assert [(r["vec_id"], round(r["cos"], 9)) for r in got.collect()] == \
           [(r["vec_id"], round(r["cos"], 9)) for r in want.collect()]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan

    ivf_path = str(tmp_path / "ivf_layout")
    write_ivf_layout(emb, ivf_path, n_lists=8)
    got2 = ann_topk_ivf_persisted(spark, ivf_path, q, k=10, n_probe=3)
    want2 = ann_topk_ivf(emb, q, k=10, n_lists=8, n_probe=3)
    assert [(r["vec_id"], round(r["cos"], 9)) for r in got2.collect()] == \
           [(r["vec_id"], round(r["cos"], 9)) for r in want2.collect()]
    plan2 = got2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [list" in plan2


def test_minhash_lsh_band_bucket_cap(spark):
    """The skew guard: buckets larger than the cap are dropped before
    the self-join (explicit recall trade), smaller ones unaffected."""
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        minhash_lsh_pairs,
    )

    # 6 identical boilerplate docs (one giant bucket) + 2 near-dups
    rows = [(i, "license header apache version two zero common") for i in range(6)]
    rows += [(10, "alpha beta gamma delta epsilon zeta"),
             (11, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(df, n_hashes=4, band_size=2, n=3).collect()
    assert sum(1 for r in uncapped if r["doc_a"] < 6 and r["doc_b"] < 6) == 15
    capped = minhash_lsh_pairs(df, n_hashes=4, band_size=2, n=3,
                               max_band_bucket=4).collect()
    boiler = [r for r in capped if r["doc_a"] < 6 and r["doc_b"] < 6]
    assert not boiler                      # giant bucket pruned
    # pairs outside the pruned bucket are unaffected
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == \
        {(r["doc_a"], r["doc_b"]) for r in uncapped
         if not (r["doc_a"] < 6 and r["doc_b"] < 6)}


def test_cosine_topk_many_matches_solo(spark, embeddings):
    """Batched serving: each query's block equals its solo cosine_topk
    bit-for-bit (same fold order), one scan for all queries."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        cosine_topk,
        cosine_topk_many,
    )

    rows = embeddings.filter("vec_id < 3").collect()
    qs = {f"q{r['vec_id']}": list(r["embedding"]) for r in rows}
    batched = cosine_topk_many(embeddings, qs, k=5)
    by_q: dict = {}
    for r in batched.collect():
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    assert set(by_q) == set(qs)
    for qid, vec in qs.items():
        solo = [(r["vec_id"], r["cos"]) for r in
                cosine_topk(embeddings, vec, k=5).collect()]
        assert by_q[qid] == solo, qid
    assert cosine_topk_many(embeddings, {}, k=5).count() == 0


def test_semantic_dedup(spark, embeddings):
    """SemDeDup composition: n_lists=1 equals pairs-exact + clustering;
    the coarse-list variant is deterministic, exact-precision (its
    non-keep set is a subset of the exact one), and labels every row."""
    from elasticsearch_osmosis_plugin_spark.functions.cluster import (
        duplicate_clusters,
    )
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        neardup_pairs_exact,
        semantic_dedup,
    )

    got = {r["doc_id"]: (r["cluster_id"], r["is_keep"]) for r in
           semantic_dedup(embeddings, threshold=0.9).collect()}
    want = {r["doc_id"]: (r["cluster_id"], r["is_keep"]) for r in
            duplicate_clusters(
                embeddings.selectExpr("vec_id AS doc_id"),
                neardup_pairs_exact(embeddings, 0.9)
                .selectExpr("vec_a AS doc_a", "vec_b AS doc_b")).collect()}
    assert got == want and len(got) == embeddings.count()
    assert any(not keep for _, keep in got.values())  # real dups exist

    coarse = {r["doc_id"]: r["is_keep"] for r in
              semantic_dedup(embeddings, threshold=0.9, n_lists=4).collect()}
    again = {r["doc_id"]: r["is_keep"] for r in
             semantic_dedup(embeddings, threshold=0.9, n_lists=4).collect()}
    assert coarse == again                      # deterministic
    exact_nonkeep = {d for d, (_, k) in got.items() if not k}
    assert {d for d, k in coarse.items() if not k} <= exact_nonkeep


def test_semantic_dedup_list_cap(spark, embeddings):
    """max_list_size skew guard: capping below every list size keeps
    everything (no pairs, all keepers) — an explicit recall trade."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        semantic_dedup,
    )

    capped = semantic_dedup(embeddings, threshold=0.9, n_lists=2,
                            max_list_size=1)
    assert capped.filter("NOT is_keep").count() == 0
    assert capped.count() == embeddings.count()


def test_duplicate_spans(spark):
    """Substring dedup: keep-first, span merge, within-doc repeats."""
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        duplicate_spans,
    )

    # 'a b c d e' occurs at (1,0), (2,2), (3,0), (3,8), (4,2); global
    # first is doc 1 pos 0, every other occurrence is flagged. Docs 2
    # and 4 share the longer 'a b c d e f g' run, whose extra windows
    # are first seen in doc 2 -> doc 2 keeps them, doc 4 flags pos
    # 2,3,4 which merge into ONE maximal span [2, 9).
    rows = [
        (1, "a b c d e x y z q r"),
        (2, "u v a b c d e f g h"),
        (4, "p q a b c d e f g s"),
        (3, "a b c d e m m m a b c d e n"),
        (5, "totally unrelated tokens only here appear once nothing"),
    ]
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
           for r in duplicate_spans(
               spark.createDataFrame(rows, "doc_id long, text string"),
               k=5).collect()}
    assert got == {(2, 2, 7, 1), (3, 0, 5, 1), (3, 8, 13, 1), (4, 2, 9, 3)}


def test_duplicate_spans_hot_gram(spark):
    """Boilerplate skew fixture: ONE 5-gram ('x0 x1 x2 x3 x4', a
    license-header analog) occurs in 50% of 200 docs. Results must
    match a per-occurrence python oracle exactly — keep-first on the
    global (doc_id, pos) key, every other occurrence cut — and the
    hot group must flow through the map-side-combined groupBy path
    (no gram-hash window; see test_plans for the plan shape)."""
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        duplicate_spans,
    )

    hot = "x0 x1 x2 x3 x4"
    rows = []
    for i in range(200):
        filler = " ".join(f"u{i}w{j}" for j in range(6))
        if i % 2 == 0:
            # hot gram at a doc-dependent position
            pos = i % 3
            toks = filler.split()
            toks[pos:pos] = hot.split()
            rows.append((i, " ".join(toks)))
        else:
            rows.append((i, filler))
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in duplicate_spans(
               spark.createDataFrame(rows, "doc_id long, text string"),
               k=5).collect()}
    # oracle: first occurrence by (doc_id, pos) is doc 0 pos 0; every
    # other even doc cuts exactly its hot window [pos, pos+5)
    want = {(i, i % 3, i % 3 + 5) for i in range(2, 200, 2)}
    assert got == want


def test_duplicate_spans_materialize_modes(spark):
    """The occ-relation storage knob changes cost, never results:
    disk (default, DISK_ONLY persist), memory, and recompute all
    produce the identical span set; disk really persists at
    DISK_ONLY (no memory residency for the O(corpus tokens)
    relation); an unknown mode raises."""
    import pytest
    from pyspark.storagelevel import StorageLevel

    from elasticsearch_osmosis_plugin_spark.functions import dedupe
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        duplicate_spans,
    )

    rows = [
        (1, "a b c d e x y z q r"),
        (2, "u v a b c d e f g h"),
        (3, "a b c d e m m m a b c d e n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(2, 2, 7), (3, 0, 5), (3, 8, 13)}

    levels = []
    orig = dedupe._materialized

    def spy(result, released):
        levels.extend(d.storageLevel for d in released)
        return orig(result, released)

    dedupe._materialized = spy
    try:
        for mode in ("disk", "memory", "recompute"):
            got = {(r["doc_id"], r["span_start"], r["span_end"])
                   for r in duplicate_spans(df, k=5,
                                            materialize=mode).collect()}
            assert got == want, mode
    finally:
        dedupe._materialized = orig
    assert levels[0] == StorageLevel.DISK_ONLY          # disk
    assert levels[1] == StorageLevel.MEMORY_AND_DISK    # memory
    assert len(levels) == 2                             # recompute: none

    with pytest.raises(ValueError, match="materialize"):
        duplicate_spans(df, materialize="gpu")


def test_cut_spans(spark):
    """Span application: covered tokens removed, text rebuilt,
    untouched docs pass through."""
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import cut_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z w")],
        "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 1, 3, 1), (1, 5, 7, 1)],
        "doc_id long, span_start long, span_end long, n_windows long")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens_cut"])
           for r in cut_spans(docs, spans).collect()}
    assert got[1] == ("a d e h", 4)      # cut [1,3) and [5,7)
    assert got[2] == ("x y z w", 0)


def test_rrf_fuse(spark):
    """RRF semantics: 1/(k+rank) sum, fixed-point rank ties on id,
    window cap, docs absent from one source still fuse."""
    from elasticsearch_osmosis_plugin_spark.operators.scorefn import rrf_fuse

    bm = spark.createDataFrame(
        [(10, 900), (20, 800), (30, 700)], "doc_id long, score_x1e4 long")
    cos = spark.createDataFrame(
        [(20, 990), (40, 980), (10, 970)], "doc_id long, score_x1e4 long")
    rows = rrf_fuse({"bm25": bm, "cos": cos}, k=10, rrf_k=60).collect()
    got = {r["doc_id"]: (r["rrf_x1e6"], r["n_sources"]) for r in rows}
    exp = {
        10: round((1 / 61 + 1 / 63) * 1e6),   # bm rank 1, cos rank 3
        20: round((1 / 62 + 1 / 61) * 1e6),
        30: round((1 / 63) * 1e6),
        40: round((1 / 62) * 1e6),
    }
    assert {d: v[0] for d, v in got.items()} == exp
    assert got[10][1] == 2 and got[30][1] == 1
    # fused order: 20 (both near top) first, then 10
    assert [r["doc_id"] for r in rows][:2] == [20, 10]
    # window=1 keeps only each source's top row
    w1 = {r["doc_id"]: r["rrf_x1e6"]
          for r in rrf_fuse({"bm25": bm, "cos": cos}, k=10, rrf_k=60,
                            window=1).collect()}
    assert set(w1) == {10, 20} and w1[10] == round(1e6 / 61)


def test_sparse_vector_topk(spark, tmp_path):
    """Learned sparse retrieval: map-lookup path == inverted impact
    path (rank + score), zero-match docs excluded, persisted impact
    layout partition-prunes and returns the same ranking."""
    import pytest as _pytest

    from elasticsearch_osmosis_plugin_spark.operators.sparsevec import (
        read_impact_layout,
        sparse_topk,
        sparse_topk_inverted,
        write_impact_layout,
    )

    rows = [
        (1, {"cat": 0.9, "dog": 0.2}),
        (2, {"dog": 0.7, "fish": 0.5}),
        (3, {"bird": 1.0}),               # matches nothing below
        (4, {"cat": 0.1, "fish": 0.3, "dog": 0.05}),
    ]
    feats = spark.createDataFrame(rows, "doc_id long, features map<string,double>")
    qw = {"cat": 1.0, "fish": 2.0}
    got = sparse_topk(feats, qw, k=10).collect()
    # hand-checked: 2 -> 1.0, 1 -> 0.9, 4 -> 0.7; 3 excluded
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(2, 1.0), (1, 0.9), (4, 0.7)]

    exploded = feats.select("doc_id", F.explode("features")
                            .alias("term", "weight"))
    inv = sparse_topk_inverted(exploded, qw, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in inv] == \
        [(r["doc_id"], round(r["score"], 9)) for r in got]

    path = str(tmp_path / "impacts")
    write_impact_layout(exploded, path, n_buckets=8)
    pruned = read_impact_layout(spark, path, qw, n_buckets=8)
    via = sparse_topk_inverted(pruned, qw, k=10)
    assert [(r["doc_id"], round(r["score"], 9)) for r in via.collect()] == \
        [(r["doc_id"], round(r["score"], 9)) for r in got]
    plan = via._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [impact_bkt" in plan

    with _pytest.raises(ValueError):
        sparse_topk(feats, {}, k=5)


def test_hard_negatives(spark):
    """Top-k cosine negatives per training query: self and known
    positives excluded BEFORE the k-cut; numpy recompute agrees."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        hard_negatives,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((12, 4)).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, rows[0][1]), (5, rows[5][1])],
        "query_id long, embedding array<float>")
    positives = spark.createDataFrame(
        [(0, 3), (5, 1)], "query_id long, vec_id long")

    got = hard_negatives(df, queries, positives, k=3).collect()
    vf = vecs.astype(np.float32).astype(np.float64)
    for qid in (0, 5):
        cos = vf @ vf[qid] / (np.linalg.norm(vf, axis=1)
                              * np.linalg.norm(vf[qid]))
        banned = {qid, {0: 3, 5: 1}[qid]}
        want = sorted(((-c, i) for i, c in enumerate(cos)
                       if i not in banned))[:3]
        mine = [(r["vec_id"], r["cos"]) for r in got if r["query_id"] == qid]
        assert [v for v, _ in mine] == [i for _, i in want]
        for (_, c_got), (nc, _) in zip(mine, want):
            assert abs(c_got - (-nc)) < 1e-9
        assert banned.isdisjoint({v for v, _ in mine})
    # no positives frame: only self excluded
    got2 = hard_negatives(df, queries, None, k=11).collect()
    assert {r["vec_id"] for r in got2 if r["query_id"] == 0} \
        == set(range(1, 12))


def test_pq_adc(spark, embeddings):
    """PQ codes round-trip deterministically, ADC distances equal a
    numpy recompute, the nearest neighbor of a near-dup pair survives
    quantization, and L2-exact top-k recall is reasonable."""
    import numpy as np

    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        _sub_slices,
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
    )

    books = pq_codebooks(embeddings, m=4, k_sub=8, seed=11, sample_n=64)
    assert [b.shape for b in books] == [(8, 4)] * 4
    codes = pq_encode(embeddings, books).collect()
    assert all(len(r["codes"]) == 4 and all(0 <= c < 8 for c in r["codes"])
               for r in codes)
    # deterministic: retrain + re-encode identical
    books2 = pq_codebooks(embeddings, m=4, k_sub=8, seed=11, sample_n=64)
    assert all((a == b).all() for a, b in zip(books, books2))

    vecs = {r["vec_id"]: np.asarray(r["embedding"])
            for r in embeddings.collect()}
    q = vecs[0]
    got = pq_topk_adc(pq_encode(embeddings, books), q, books, k=40).collect()

    # ADC distance == numpy recompute through the same codes
    code_by_id = {r["vec_id"]: r["codes"] for r in codes}
    for r in got:
        d2 = 0.0
        for j, (s, ln) in enumerate(_sub_slices(16, 4)):
            c = books[j][code_by_id[r["vec_id"]][j]]
            d2 += float(((q[s:s + ln] - c) ** 2).sum())
        assert abs(r["dist2"] - d2) < 1e-9

    # the engineered near-dup (vec 1) quantizes next to its twin
    ranks = [r["vec_id"] for r in got]
    assert ranks.index(1) <= 3
    # recall@10 vs exact L2 — coarse grid, but related vectors stay close
    exact = sorted(vecs, key=lambda i: float(((vecs[i] - q) ** 2).sum()))[:10]
    assert len(set(ranks[:10]) & set(exact)) >= 5


def test_ann_ivfpq(spark, embeddings):
    """IVF-PQ composition: probe-list pruning is a strict candidate
    subset, ADC ordering is deterministic, and exact re-rank returns
    true cosines with the engineered near-dup on top."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        ann_topk_ivfpq,
        cosine_topk,
    )

    q = [r["embedding"] for r in
         embeddings.filter("vec_id = 0").collect()][0]
    adc = ann_topk_ivfpq(embeddings, q, k=40, n_lists=4, n_probe=4,
                         m=4, k_sub=8, seed=11).collect()
    # n_probe = n_lists: nothing pruned -> pure PQ over all 40 vectors
    assert len(adc) == 40
    assert adc[0]["vec_id"] in (0, 1)       # query + its near-dup share codes
    again = ann_topk_ivfpq(embeddings, q, k=40, n_lists=4, n_probe=4,
                           m=4, k_sub=8, seed=11).collect()
    assert [tuple(r) for r in adc] == [tuple(r) for r in again]

    # pruned probe: candidates are a subset of the unpruned run
    pruned = ann_topk_ivfpq(embeddings, q, k=40, n_lists=4, n_probe=1,
                            m=4, k_sub=8, seed=11).collect()
    assert {r["vec_id"] for r in pruned} <= {r["vec_id"] for r in adc}
    assert 0 < len(pruned) <= 40

    # exact re-rank: scores are TRUE cosines, near-dup pair leads
    rr = ann_topk_ivfpq(embeddings, q, k=5, n_lists=4, n_probe=4,
                        m=4, k_sub=8, seed=11, rerank=20).collect()
    exact = {r["vec_id"]: r["cos"]
             for r in cosine_topk(embeddings, q, k=40).collect()}
    assert rr[0]["vec_id"] == 0 and abs(rr[0]["cos"] - 1.0) < 1e-9
    assert rr[1]["vec_id"] == 1              # the engineered near-dup
    for r in rr:
        assert abs(r["cos"] - exact[r["vec_id"]]) < 1e-9


def test_pq_persisted_layout(spark, embeddings, tmp_path):
    """write_pq_layout + pq_topk_persisted == the in-memory encode +
    ADC path; the IVF-partitioned variant prunes partitions in the
    executed plan."""
    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
        pq_topk_persisted,
        write_pq_layout,
    )

    q = [r["embedding"] for r in
         embeddings.filter("vec_id = 0").collect()][0]
    books = pq_codebooks(embeddings, m=4, k_sub=8, seed=11)
    want = [tuple(r) for r in
            pq_topk_adc(pq_encode(embeddings, books), q, books,
                        k=40).collect()]

    flat = str(tmp_path / "pq_flat")
    write_pq_layout(embeddings, flat, m=4, k_sub=8, seed=11)
    got = [tuple(r) for r in
           pq_topk_persisted(spark, flat, q, k=40).collect()]
    assert got == want

    part = str(tmp_path / "pq_ivf")
    write_pq_layout(embeddings, part, m=4, k_sub=8, n_lists=4, seed=11)
    full = pq_topk_persisted(spark, part, q, k=40, n_probe=4)
    assert [tuple(r) for r in full.collect()] == want  # all lists probed
    pruned = pq_topk_persisted(spark, part, q, k=40, n_probe=1)
    assert {r["vec_id"] for r in pruned.collect()} \
        <= {v for v, _ in want}
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [list" in plan.replace("#", "").replace(
        " ", " ") or "list#" in plan.split("PartitionFilters")[1][:120]


def test_ann_sq_rescored_scores_are_exact(spark):
    """rescore_vector semantics: returned scores must equal the FLOAT
    cosine (quantization bounds only the candidate cut), and with a
    generous oversample the top-k must equal brute force exactly."""
    import random

    from elasticsearch_osmosis_plugin_spark.functions.similarity import (
        ann_topk_sq_rescored,
        cosine_topk,
    )

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[3][1]
    exact = cosine_topk(df, q, k=5).collect()
    got = ann_topk_sq_rescored(df, q, k=5, oversample=8.0).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    for g, e in zip(got, exact):
        assert abs(g["cos"] - e["cos"]) < 1e-12   # float scores, not grid
    # broadcast join-back plan: candidate side must broadcast
    plan = ann_topk_sq_rescored(df, q, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
