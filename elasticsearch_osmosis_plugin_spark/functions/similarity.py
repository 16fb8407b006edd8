"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: JVM-side fold (F.aggregate/zip_with) — the
  exact baseline, a single narrow pass + TakeOrderedAndProject;
- LSH-bucketed ANN (random hyperplanes): the scale path — candidates
  only from matching buckets, then exact re-scoring;
- exact cosine near-dup pairs (block-nested equi-join on bucket for
  the LSH variant).

Determinism: hyperplanes come from a seeded numpy Generator; the dot
product folds left-to-right (F.aggregate is a sequential fold), so
scores are bit-stable across partitionings.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from elasticsearch_osmosis_plugin_spark.operators.topk import deterministic_topk


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_scores(df: DataFrame, query_vec: Sequence[float],
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine similarity of every row vs a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))


def cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_dp: int | None = None) -> DataFrame:
    """Brute-force exact top-k: one narrow pass, per-partition heaps
    (TakeOrderedAndProject) — the correctness baseline for ANN."""
    scores = cosine_scores(df, query_vec, id_col, vec_col)
    return deterministic_topk(scores, k, score_col="cos", id_col="vec_id",
                              round_dp=round_dp)


def cosine_topk_many(df: DataFrame, queries: dict[str, Sequence[float]],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Batched exact similarity serving: N query vectors answered in
    ONE table scan (the ANN analog of ``operators.query.topk_many``).
    The queries fold into a literal struct array; each row computes
    its norm once and scores against every query inside the same
    projection, then a per-query window rank takes the top-k ->
    (query_id, vec_id, cos), each block identical (bit-for-bit — the
    same left-to-right fold) to the solo ``cosine_topk``.

    Shuffle carries |rows| x |queries| scored pairs — for large
    batches at scale, pre-filter with the LSH/IVF layouts first and
    feed the union of candidates here."""
    from pyspark.sql import Window

    if not queries:
        return df.sparkSession.createDataFrame(
            [], "query_id string, vec_id long, cos double")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    entries = F.array(*[
        F.struct(F.lit(qid).alias("qid"),
                 F.array(*[F.lit(float(x)) for x in vec]).alias("q"))
        for qid, vec in sorted(queries.items())])
    exploded = df.select(F.col(id_col).alias("vec_id"), v.alias("_v"),
                         _norm(v).alias("_nv"),
                         F.explode(entries).alias("_q"))
    cos = (_dot(F.col("_v"), F.col("_q.q"))
           / (F.col("_nv") * _norm(F.col("_q.q"))))
    scored = exploded.select(F.col("_q.qid").alias("query_id"),
                             "vec_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .orderBy("query_id", F.desc("cos"), F.asc("vec_id")))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(np.random.SeedSequence([seed, dim, n_planes])) \
        .standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col: str, planes: np.ndarray):
    """Sign-pattern bucket id: bit i = (v . h_i) >= 0. Pure column
    expressions — computed JVM-side, no UDF."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        q = F.array(*[F.lit(float(x)) for x in h])
        bucket = bucket + F.when(_dot(v, q) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _seq_dot(a, b) -> float:
    """Strict left-to-right float64 dot — the SAME summation order as
    the Spark F.aggregate fold and the SQL list_reduce twin, so sign
    decisions (bucket bits) are bit-identical across engines (numpy
    pairwise/BLAS dots are not)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def ann_topk_lsh(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                 n_planes: int = 8, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 multiprobe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane
    sign-bucket is within ``multiprobe_hamming`` bits of the query's
    bucket. Deterministic (seeded planes). At scale the bucket column
    is precomputed and the table is partitioned by it, so a query
    reads only its probe buckets."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    q = np.asarray(list(query_vec), dtype=np.float64)
    q_bucket = int(sum(1 << i for i, h in enumerate(planes)
                       if _seq_dot(h, q) >= 0))
    probe = [b for b in range(1 << n_planes)
             if bin(b ^ q_bucket).count("1") <= multiprobe_hamming]
    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    cand = bucketed.filter(F.col("_bucket").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lloyd_centroids(x: np.ndarray, n_lists: int, seed: int = 42,
                    iters: int = 5) -> np.ndarray:
    """Seeded Lloyd iterations on an in-memory sample. Shared by the
    Spark path and the DuckDB oracle twin — same numpy ops on the same
    sample matrix give bit-identical centroids in both."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, n_lists]))
    cents = x[rng.choice(x.shape[0], size=min(n_lists, x.shape[0]),
                         replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(cents.shape[0]):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents


def ivf_sample_order(id_col, seed: int):
    """Deterministic, engine-portable sample order: md5 of
    '<id>|<seed>' (hex sorts identically everywhere; xxhash64 would
    not be computable by a SQL oracle)."""
    return F.md5(F.concat_ws("|", F.col(id_col).cast("string"),
                             F.lit(str(seed))))


def ivf_centroids(df: DataFrame, n_lists: int = 16, seed: int = 42,
                  sample_n: int = 4096, iters: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Train the IVF coarse quantizer: deterministic hash-ordered sample
    (bounded — centroid training never scans the full table) + seeded
    Lloyd iterations in driver numpy. n_lists x dim floats is tiny at
    any scale; the FAISS design trains on a sample the same way."""
    rows = (df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .orderBy(ivf_sample_order("_id", seed), F.col("_id"))
            .limit(sample_n).collect())
    if not rows:
        raise ValueError("ivf_centroids: cannot train on an empty input")
    x = np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)
    return lloyd_centroids(x, n_lists, seed, iters)


def ivf_assign_col(vec_col: str, cents: np.ndarray):
    """pandas UDF: vector -> nearest-centroid list id (one numpy matmul
    per Arrow batch; ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2, the v-term
    is rank-constant so argmin uses c-norms and dot products only)."""
    c = np.ascontiguousarray(cents, dtype=np.float64)
    c_norm2 = (c * c).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vs in it:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            if x.size == 0:
                yield pd.Series(np.empty(0, dtype=np.int32))
                continue
            scores = c_norm2[None, :] - 2.0 * (x @ c.T)
            yield pd.Series(scores.argmin(axis=1).astype(np.int32))

    return _assign(F.col(vec_col))


def ivf_assign_expr(vec_col: str, cents: np.ndarray):
    """Pure-column-expression nearest-centroid assignment (JVM-side,
    sequential folds): rank-constant form ||c||^2 - 2 v.c, argmin =
    first index of the min. Bit-identical to a SQL twin using the same
    centroid literals + a sequential list_reduce fold — use for small
    n_lists; ``ivf_assign_col`` (Arrow batch matmul) is the path for
    hundreds of lists."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scores = []
    for c in np.ascontiguousarray(cents, dtype=np.float64):
        cl = F.array(*[F.lit(float(x)) for x in c])
        n2 = float((c * c).sum())
        scores.append(F.lit(n2) - F.lit(2.0) * _dot(v, cl))
    arr = F.array(*scores)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def ann_topk_ivf(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                 n_lists: int = 16, n_probe: int = 4, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 cents: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: score only vectors whose coarse-quantizer
    list is among the query's ``n_probe`` nearest lists, then exact
    cosine re-scoring. At scale the list id is precomputed at ingest
    and the table is partitioned by it (partition pruning per query);
    pass ``cents`` to reuse a trained quantizer across queries."""
    if cents is None:
        try:
            cents = ivf_centroids(df, n_lists, seed, id_col=id_col,
                                  vec_col=vec_col)
        except ValueError:
            # empty table: return an empty, correctly-typed result
            return cosine_topk(df.limit(0), query_vec, k, id_col, vec_col)
    q = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    assign = (ivf_assign_expr(vec_col, cents) if len(cents) <= 32
              else ivf_assign_col(vec_col, cents))
    cand = df.withColumn("_list", assign).filter(F.col("_list").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------- persisted
# ANN layouts: the precompute-at-ingest path. The bucket/list id is
# computed ONCE at write time and becomes the parquet partition column,
# so a query scans only its probe partitions (PartitionFilters) instead
# of recomputing assignments over the full table per query.

_ANN_META = "_ANN_META.json"


def _write_ann_meta(path: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, "_ann_meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, _ANN_META))


def _read_ann_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _ANN_META)) as f:
        return json.load(f)


def write_lsh_layout(df: DataFrame, path: str, n_planes: int = 8,
                     seed: int = 42, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> dict:
    """Write the embeddings table partitioned by its LSH sign bucket
    (bucket column computed once, JVM-side). The layout is
    self-describing: plane seed/shape land in ``_ANN_META.json``."""
    sample = df.select(vec_col).limit(1).collect()
    if not sample:
        raise ValueError("write_lsh_layout: empty input")
    dim = len(sample[0][0])
    planes = hyperplanes(dim, n_planes, seed)
    (df.withColumn("bucket", lsh_bucket_col(vec_col, planes))
       .write.mode("overwrite").partitionBy("bucket").parquet(path))
    meta = {"kind": "lsh", "n_planes": n_planes, "seed": seed, "dim": dim,
            "id_col": id_col, "vec_col": vec_col}
    _write_ann_meta(path, meta)
    return meta


def ann_topk_lsh_persisted(spark, path: str, query_vec: Sequence[float],
                           k: int = 10,
                           multiprobe_hamming: int = 1) -> DataFrame:
    """Top-k over a ``write_lsh_layout`` table: the probe buckets are
    plain partition predicates — only those directories are read."""
    meta = _read_ann_meta(path)
    planes = hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    q = np.asarray(list(query_vec), dtype=np.float64)
    q_bucket = int(sum(1 << i for i, h in enumerate(planes)
                       if _seq_dot(h, q) >= 0))
    probe = [b for b in range(1 << meta["n_planes"])
             if bin(b ^ q_bucket).count("1") <= multiprobe_hamming]
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probe))
    return cosine_topk(cand, query_vec, k, meta["id_col"], meta["vec_col"])


def write_ivf_layout(df: DataFrame, path: str, n_lists: int = 16,
                     seed: int = 42, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> dict:
    """Write the embeddings table partitioned by its IVF list id; the
    trained centroids are persisted in ``_ANN_META.json`` so queries
    never retrain."""
    cents = ivf_centroids(df, n_lists, seed, id_col=id_col, vec_col=vec_col)
    assign = (ivf_assign_expr(vec_col, cents) if len(cents) <= 32
              else ivf_assign_col(vec_col, cents))
    (df.withColumn("list", assign)
       .write.mode("overwrite").partitionBy("list").parquet(path))
    meta = {"kind": "ivf", "n_lists": n_lists, "seed": seed,
            "cents": [[float(x) for x in c] for c in cents],
            "id_col": id_col, "vec_col": vec_col}
    _write_ann_meta(path, meta)
    return meta


def ann_topk_ivf_persisted(spark, path: str, query_vec: Sequence[float],
                           k: int = 10, n_probe: int = 4) -> DataFrame:
    """Top-k over a ``write_ivf_layout`` table: probe lists are
    partition predicates — no per-query assignment pass."""
    meta = _read_ann_meta(path)
    cents = np.asarray(meta["cents"], dtype=np.float64)
    q = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    cand = spark.read.parquet(path).filter(F.col("list").isin(probe))
    return cosine_topk(cand, query_vec, k, meta["id_col"], meta["vec_col"])


def neardup_pairs_exact(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact cosine near-dup pairs (all pairs >= threshold, a<b).
    O(n^2) — correctness baseline; use neardup_pairs_lsh at scale."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("vid"), v.alias("v"),
                     _norm(v).alias("nrm"))
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    return (a.join(b, F.col("a.vid") < F.col("b.vid"))
            .filter(cos >= threshold)
            .select(F.col("a.vid").alias("vec_a"),
                    F.col("b.vid").alias("vec_b"), x1e4(cos).alias("cos_x1e4")))


def neardup_pairs_lsh(df: DataFrame, threshold: float = 0.95,
                      n_planes: int = 8, seed: int = 42,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Scale path: equi-join on the LSH bucket (near-identical vectors
    share sign patterns with high probability), then exact re-check.
    Approximate recall, exact precision."""
    sample = df.select(vec_col).limit(1).collect()
    if not sample:
        return neardup_pairs_exact(df.limit(0), threshold, id_col, vec_col)
    dim = len(sample[0][0])
    planes = hyperplanes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("vid"), v.alias("v"), _norm(v).alias("nrm"),
                     lsh_bucket_col(vec_col, planes).alias("bucket"))
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vid") < F.col("b.vid")))
            .filter(cos >= threshold)
            .select(F.col("a.vid").alias("vec_a"),
                    F.col("b.vid").alias("vec_b"), x1e4(cos).alias("cos_x1e4")))


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   n_lists: int = 1, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   cents: np.ndarray | None = None,
                   max_list_size: int | None = None) -> DataFrame:
    """SemDeDup-shaped semantic deduplication over an embedding
    column: coarse k-means clustering, exact cosine near-dup pairs
    WITHIN each coarse cluster, connected components, keep the minimum
    id per component -> (doc_id, cluster_id, is_keep) for EVERY row.

    ``n_lists=1`` compares all pairs — the exact correctness baseline.
    At scale, ``n_lists >> 1`` restricts the quadratic join to
    same-coarse-list pairs (the SemDeDup design: near-duplicates land
    in the same k-means cluster with high probability), so candidate
    volume is ~n^2 / n_lists for balanced lists. Approximate recall
    across list boundaries, exact precision (every emitted pair is
    re-checked with the exact cosine).

    ``max_list_size`` guards the skew case (one giant coarse list —
    e.g. boilerplate embeddings collapsing onto a centroid — would
    reintroduce the quadratic join): lists larger than the cap are
    EXCLUDED from pair generation, so their members keep is_keep=True.
    That is an explicit recall trade the caller opts into, not a
    silent truncation — leave it None to compare everything."""
    from elasticsearch_osmosis_plugin_spark.functions.cluster import (
        duplicate_clusters,
    )

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).cast("long").alias("vid"),
                     v.alias("v"), _norm(v).alias("nrm"))
    if n_lists > 1:
        if cents is None:
            cents = ivf_centroids(df, n_lists, seed,
                                  id_col=id_col, vec_col=vec_col)
        base = base.withColumn("_list", ivf_assign_col("v", cents))
        if max_list_size is not None:
            sizes = (base.groupBy("_list")
                     .agg(F.count(F.lit(1)).alias("_n"))
                     .filter(F.col("_n") <= max_list_size)
                     .select("_list"))
            base = base.join(F.broadcast(sizes), "_list", "left_semi")
        join_cond = [F.col("a._list") == F.col("b._list"),
                     F.col("a.vid") < F.col("b.vid")]
    else:
        join_cond = [F.col("a.vid") < F.col("b.vid")]
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (a.join(b, join_cond)
             .filter(cos >= threshold)
             .select(F.col("a.vid").alias("doc_a"),
                     F.col("b.vid").alias("doc_b")))
    return duplicate_clusters(df.select(F.col(id_col).alias("doc_id")),
                              pairs)


# -------------------------------------------------------- int8 quantization

def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization (the FAISS SQ8 shape): per-vector
    scale = max|v| / 127, q_i = round(v_i / scale) in [-127, 127] ->
    (id, qvec array<int>, scale). 4x memory cut for the ANN corpus;
    cosine over the int vectors needs NO dequantize (the per-vector
    scales cancel), so the scale column only serves reconstruction.

    round() is HALF_UP/away-from-zero in both Spark and DuckDB, which
    keeps the quantized grid (and thus every downstream ranking)
    bit-identical across engines. Pure column expressions — narrow
    map, no UDF, no shuffle."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
         .alias("qvec"),
        scale.alias("scale"))


def quantize_vec_py(vec) -> tuple[list[int], float]:
    """Driver-side twin of :func:`quantize_embeddings` for query
    vectors — floor(x+0.5)/ceil(x-0.5) to match SQL HALF_UP (numpy's
    round is half-to-even and would disagree on the grid)."""
    import math as _math

    x = [float(t) for t in vec]
    amax = max((abs(t) for t in x), default=0.0)
    scale = amax / 127.0 if amax > 0 else 1.0
    q = [int(_math.floor(t / scale + 0.5)) if t >= 0
         else int(_math.ceil(t / scale - 0.5)) for t in x]
    return q, scale


def cosine_topk_quantized(dfq: DataFrame, query_vec: Sequence[float],
                          k: int = 10, id_col: str = "vec_id",
                          qvec_col: str = "qvec") -> DataFrame:
    """Exact cosine over the int8-quantized corpus: integer dot and
    norms (exact in int64), one double division at the end ->
    (vec_id, cos). Approximation error comes ONLY from the grid, not
    the arithmetic; agreement with float cosine is the recall test.
    Same narrow TakeOrderedAndProject plan as :func:`cosine_topk`."""
    q, _ = quantize_vec_py(query_vec)
    qc = F.array(*[F.lit(int(t)) for t in q])
    a = F.transform(F.col(qvec_col), lambda x: x.cast("long"))
    b = F.transform(qc, lambda x: x.cast("long"))
    dot = F.zip_with(a, b, lambda x, y: x * y)
    sdot = F.aggregate(dot, F.lit(0).cast("long"), lambda acc, x: acc + x)
    na = F.aggregate(F.transform(a, lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, x: acc + x)
    nb = sum(t * t for t in q)
    cos = F.when((na > 0) & (F.lit(nb) > 0),
                 sdot.cast("double")
                 / (F.sqrt(na.cast("double")) * F.lit(float(nb) ** 0.5))) \
           .otherwise(F.lit(0.0))
    scores = dfq.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
    return deterministic_topk(scores, k, score_col="cos", id_col="vec_id")


def ann_topk_sq_rescored(df: DataFrame, query_vec: Sequence[float],
                         k: int = 10, oversample: float = 3.0,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """ES ``rescore_vector`` (the 9.x default for quantized
    dense_vector indices): search the int8-quantized corpus for
    ``k * oversample`` candidates, then re-score EXACTLY those
    candidates against the float vectors and return the true top-k —
    quantization grid error is confined to the candidate cut, never
    the returned scores.

    Plan shape at 100 TB: the wide scan reads only the 4x-smaller
    qvec column (stage 1's TakeOrderedAndProject); stage 2 joins the
    k'-bounded candidate ids back by BROADCAST, so the float vectors
    are fetched for k' rows, not the corpus. Fully deterministic
    (HALF_UP grid both engines + deterministic tie-break), so the
    whole two-stage plan is oracle-checkable value-for-value."""
    dfq = quantize_embeddings(df, id_col, vec_col)
    kq = max(int(k * oversample), k)
    cand = cosine_topk_quantized(dfq, query_vec, kq)
    cand_ids = cand.select(F.col("vec_id").alias("__cand_id"))
    hits = df.join(F.broadcast(cand_ids),
                   F.col(id_col) == F.col("__cand_id"), "inner") \
        .drop("__cand_id")
    exact = cosine_scores(hits, query_vec, id_col, vec_col)
    return deterministic_topk(exact, k, score_col="cos",
                              id_col="vec_id")


def hard_negatives(df: DataFrame, queries: DataFrame,
                   positives: DataFrame | None = None, k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training: for
    each training query, the top-k most-similar corpus vectors that
    are NOT known positives — the standard dense-retrieval negative
    sampler (DPR/ANCE-style, cosine flavor).

    ``queries``: (query_id, query vector) rows — query embeddings live
    in a DataFrame (not literals) because real mining runs thousands
    of training queries per pass. ``positives``: (query_id, vec_id)
    pairs to exclude; a query's own id is always excluded (the trivial
    positive).

    Plan: one corpus scan; the query frame broadcasts (bounded by the
    training batch, small vs the corpus) into a crossJoin so every
    (row, query) cosine is computed in codegen with the row norm
    evaluated once; positives anti-join BEFORE the per-query window
    rank, so every returned row is a usable negative (post-filtering
    would under-fill). At larger query batches, pre-bucket both sides
    with the LSH/IVF layouts and feed candidates here — identical
    downstream."""
    from pyspark.sql import Window

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    corpus = df.select(F.col(id_col).alias("vec_id"), v.alias("_v"),
                       _norm(v).alias("_nv"))
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qf = queries.select(F.col("query_id"), qv.alias("_q"),
                        _norm(qv).alias("_nq"))
    scored = (corpus.crossJoin(F.broadcast(qf))
              .select("query_id", "vec_id",
                      (_dot(F.col("_v"), F.col("_q"))
                       / (F.col("_nv") * F.col("_nq"))).alias("cos")))
    # self-exclusion by string identity: when queries ARE corpus docs
    # (query_id = the doc's vec_id, the usual mining setup) the doc
    # never returns itself; symbolic query ids ("q1") compare unequal
    # to every vec_id instead of null-coercing the whole frame away
    scored = scored.filter(F.col("vec_id").cast("string")
                           != F.col("query_id").cast("string"))
    if positives is not None:
        pos = positives.select(F.col("query_id"),
                               F.col("vec_id").cast("long").alias("vec_id"))
        scored = scored.join(F.broadcast(pos), ["query_id", "vec_id"],
                             "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .orderBy("query_id", F.desc("cos"), F.asc("vec_id")))


# ------------------------------------------------ product quantization

def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """m contiguous subspaces of a dim-vector -> [(start0, len), ...]
    (0-based starts; the last subspace absorbs the remainder)."""
    base = dim // m
    out, pos = [], 0
    for j in range(m):
        ln = base + (1 if j < dim % m else 0)
        out.append((pos, ln))
        pos += ln
    return out


def pq_codebooks(df: DataFrame, m: int = 4, k_sub: int = 16,
                 seed: int = 42, sample_n: int = 4096, iters: int = 5,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[np.ndarray]:
    """Train product-quantization codebooks (the FAISS PQ shape): the
    vector splits into ``m`` contiguous subspaces, each learning its
    own ``k_sub``-centroid quantizer on the SAME deterministic
    hash-ordered sample :func:`ivf_centroids` trains on. Returns
    [codebook_j (k_sub, dsub_j)] — m*k_sub*dsub floats, tiny at any
    scale; memory per encoded vector is m codes (m bytes at
    k_sub<=256) vs 4*dim bytes raw."""
    rows = (df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .orderBy(ivf_sample_order("_id", seed), F.col("_id"))
            .limit(sample_n).collect())
    if not rows:
        raise ValueError("pq_codebooks: cannot train on an empty input")
    x = np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)
    books = []
    for j, (s, ln) in enumerate(_sub_slices(x.shape[1], m)):
        books.append(lloyd_centroids(np.ascontiguousarray(x[:, s:s + ln]),
                                     k_sub, seed + 7919 * (j + 1), iters))
    return books


def pq_encode_expr(vec_col: str, codebooks: list[np.ndarray]):
    """codes array<int> as PURE column expressions: per subspace, the
    rank-constant ||c||^2 - 2 v.c scores fold sequentially (the same
    left-to-right order as the SQL twin's list_reduce), argmin = first
    index of the min — bit-identical across engines, so PQ gets a
    full value-for-value oracle, not rows-only. m*k_sub folds of
    dsub-length slices, all inside whole-stage codegen."""
    dim = sum(b.shape[1] for b in codebooks)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    codes = []
    for j, (s, ln) in enumerate(_sub_slices(dim, len(codebooks))):
        sub = F.slice(v, s + 1, ln)
        scores = []
        for c in np.ascontiguousarray(codebooks[j], dtype=np.float64):
            cl = F.array(*[F.lit(float(t)) for t in c])
            scores.append(F.lit(float((c * c).sum()))
                          - F.lit(2.0) * _dot(sub, cl))
        arr = F.array(*scores)
        codes.append((F.array_position(arr, F.array_min(arr)) - 1)
                     .cast("int"))
    return F.array(*codes)


def pq_encode(df: DataFrame, codebooks: list[np.ndarray],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(vec_id, codes array<int>): the compressed corpus — write this
    once at ingest; queries never touch the raw vectors again."""
    return df.select(F.col(id_col).alias("vec_id"),
                     pq_encode_expr(vec_col, codebooks).alias("codes"))


def pq_topk_adc(dfc: DataFrame, query_vec: Sequence[float],
                codebooks: list[np.ndarray], k: int = 10,
                codes_col: str = "codes") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (FAISS ADC): the query
    precomputes one m x k_sub table of exact subspace distances
    ||q_j - c_j,i||^2 (driver floats -> literals), and each row's
    approximate squared L2 distance is m table lookups + adds — a
    single codegen projection over the CODES table, the raw vectors
    are never read. -> (vec_id, dist2) ascending (nearest first),
    deterministic (vec_id tiebreak).

    Approximation error comes only from the quantization grid; re-rank
    the top candidates against raw vectors when exact order matters
    (the standard FAISS recipe)."""
    q = [float(t) for t in query_vec]
    dim = sum(b.shape[1] for b in codebooks)
    if len(q) != dim:
        raise ValueError(f"query dim {len(q)} != codebook dim {dim}")
    dist = None
    for j, (s, ln) in enumerate(_sub_slices(dim, len(codebooks))):
        qj = q[s:s + ln]
        tbl = []
        for c in codebooks[j]:
            acc = 0.0
            for a, b in zip(qj, c):
                acc += (a - float(b)) * (a - float(b))
            tbl.append(acc)
        lit = F.array(*[F.lit(t) for t in tbl])
        term = F.element_at(lit, F.element_at(F.col(codes_col), j + 1)
                            + F.lit(1))
        dist = term if dist is None else dist + term
    out = dfc.select("vec_id", dist.alias("dist2"))
    return (out.orderBy(F.asc("dist2"), F.asc("vec_id")).limit(k))


def ann_topk_ivfpq(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                   n_lists: int = 8, n_probe: int = 3, m: int = 4,
                   k_sub: int = 16, seed: int = 42, rerank: int = 0,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   cents: np.ndarray | None = None,
                   codebooks: list[np.ndarray] | None = None) -> DataFrame:
    """IVF-PQ (the canonical FAISS index shape): coarse-quantizer list
    pruning (:func:`ann_topk_ivf`'s probe logic) composed with PQ/ADC
    scoring (:func:`pq_topk_adc`) — only the probed lists' rows are
    scored, and each is m table lookups, never a raw-vector read.

    ``rerank > 0`` runs the standard refinement: the top ``rerank``
    ADC candidates re-score EXACT cosine from the raw vectors (a
    point-lookup-sized second pass), and the final k comes from that
    exact ordering -> (vec_id, cos). With ``rerank=0`` the result is
    (vec_id, dist2) in pure ADC order. At ingest scale, persist codes
    + list ids partitioned by list (``write_ivf_layout``'s pattern) so
    the probe is partition pruning."""
    if cents is None:
        cents = ivf_centroids(df, n_lists, seed, id_col=id_col,
                              vec_col=vec_col)
    if codebooks is None:
        codebooks = pq_codebooks(df, m=m, k_sub=k_sub, seed=seed,
                                 id_col=id_col, vec_col=vec_col)
    q = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    assign = (ivf_assign_expr(vec_col, cents) if len(cents) <= 32
              else ivf_assign_col(vec_col, cents))
    cand = df.withColumn("_list", assign).filter(F.col("_list").isin(probe))
    codes = cand.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("_raw"),
                        pq_encode_expr(vec_col, codebooks).alias("codes"))
    adc = pq_topk_adc(codes, query_vec, codebooks,
                      k=max(k, rerank))
    if not rerank:
        return adc
    picked = codes.join(adc.select("vec_id"), "vec_id", "left_semi")
    return cosine_topk(picked, query_vec, k, "vec_id", "_raw")


def write_pq_layout(df: DataFrame, path: str, m: int = 4, k_sub: int = 16,
                    n_lists: int | None = None, seed: int = 42,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """The precompute-at-ingest PQ layout: train codebooks once, write
    the CODES table (m small ints per vector — the raw embeddings are
    not stored here), optionally partitioned by an IVF coarse list
    (``n_lists``) so queries probe-prune partitions. Codebooks (+
    centroids) persist in ``_ANN_META.json``; queries never retrain
    or re-encode."""
    books = pq_codebooks(df, m=m, k_sub=k_sub, seed=seed,
                         id_col=id_col, vec_col=vec_col)
    out = df.select(F.col(id_col).alias("vec_id"),
                    pq_encode_expr(vec_col, books).alias("codes"))
    meta = {"kind": "pq", "m": m, "k_sub": k_sub, "seed": seed,
            "codebooks": [[[float(x) for x in c] for c in b]
                          for b in books],
            "id_col": id_col, "vec_col": vec_col}
    if n_lists:
        cents = ivf_centroids(df, n_lists, seed, id_col=id_col,
                              vec_col=vec_col)
        assign = (ivf_assign_expr(vec_col, cents) if len(cents) <= 32
                  else ivf_assign_col(vec_col, cents))
        out = df.select(F.col(id_col).alias("vec_id"),
                        pq_encode_expr(vec_col, books).alias("codes"),
                        assign.alias("list"))
        meta["cents"] = [[float(x) for x in c] for c in cents]
        out.write.mode("overwrite").partitionBy("list").parquet(path)
    else:
        out.write.mode("overwrite").parquet(path)
    _write_ann_meta(path, meta)
    return meta


def pq_topk_persisted(spark, path: str, query_vec: Sequence[float],
                      k: int = 10, n_probe: int = 4) -> DataFrame:
    """ADC top-k over a ``write_pq_layout`` table: the stored
    codebooks score the CODES scan directly (m lookups/row); with an
    IVF-partitioned layout the probe lists are partition predicates —
    only those directories are read, and still only the codes
    columns."""
    meta = _read_ann_meta(path)
    books = [np.asarray(b, dtype=np.float64) for b in meta["codebooks"]]
    dfc = spark.read.parquet(path)
    if "cents" in meta:
        cents = np.asarray(meta["cents"], dtype=np.float64)
        q = np.asarray(list(query_vec), dtype=np.float64)
        d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
        probe = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
        dfc = dfc.filter(F.col("list").isin(probe))
    return pq_topk_adc(dfc, query_vec, books, k=k)
