"""Duplicate clustering: connected components over near-dup pairs.

The missing last step of every dedup pipeline: pair emitters
(``dedupe.minhash_lsh_pairs``, ``simhash_neardup_pairs``,
``similarity.neardup_pairs_*``) produce an EDGE SET; keeping one doc
per duplicate *cluster* requires its connected components (a chain
a~b~c must collapse to one survivor even though (a, c) was never
emitted as a pair).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round
is two groupBy-shuffles over the current edge set, and the edge set
contracts toward stars rooted at each component's minimum id in
O(log n) rounds. This is the published scale-out CC algorithm (it is
what GraphFrames/GraphX implement); naive label propagation needs
O(diameter) rounds and a long dup-chain (shingled boilerplate) can
have diameter in the thousands.

Everything is DataFrame-native; the only driver-side work is the
per-round convergence probe (count + order-independent hash — one
tiny action on an edge set that only shrinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sym(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    m = min(N(u) ∪ {u})."""
    sym = _sym(edges)
    m = (sym.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("mn", F.col("u")).alias("mn")))
    return (sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor <= u to
    m = min(N_<=(u) ∪ {u})."""
    # orient every edge small->large: v <= u after this projection
    le = (_sym(edges).filter(F.col("v") < F.col("u"))
          .select("u", "v").distinct())
    m = (le.groupBy("u").agg(F.min("v").alias("mn")))
    return (le.join(m, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .unionByName(m.select(F.col("u"), F.col("mn").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _probe(edges: DataFrame) -> tuple[int, int]:
    """(n_edges, order-independent content hash) in ONE action."""
    # XOR fold: order-independent and overflow-free under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iter: int = 25) -> DataFrame:
    """-> (doc_id, cluster_id): cluster_id is the minimum doc id of the
    component. Only nodes that appear in ``pairs`` are returned
    (singletons are the caller's left-anti complement —
    ``duplicate_clusters`` does it for the common case)."""
    edges = (pairs.select(F.col(a_col).cast("long").alias("u"),
                          F.col(b_col).cast("long").alias("v"))
             .filter(F.col("u") != F.col("v")))
    nodes = (_sym(edges).select(F.col("u").alias("doc_id")).distinct())
    prev = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges))
        # localCheckpoint cuts the exponentially-growing lineage (each
        # round would otherwise replan the full history) and caches the
        # shrinking edge set for the convergence probe + next round
        edges = edges.localCheckpoint(eager=True)
        cur = _probe(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in "
                           f"{max_iter} rounds ({prev} edges)")
    # converged edge set is a star per component, rooted at the min id
    labels = (_sym(edges).groupBy("u").agg(F.min("v").alias("mn"))
              .select(F.col("u").alias("doc_id"),
                      F.least("mn", F.col("u")).alias("cluster_id")))
    # nodes that lost all edges during contraction (they were interior
    # to a star) still need a label: re-attach via the surviving root
    return (nodes.join(labels, "doc_id", "left")
            .select("doc_id", F.coalesce("cluster_id", F.col("doc_id"))
                    .alias("cluster_id")))


def duplicate_clusters(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       a_col: str = "doc_a", b_col: str = "doc_b",
                       max_iter: int = 25,
                       keep_by=None) -> DataFrame:
    """Every doc labeled: (doc_id, cluster_id, is_keep). Docs in no
    pair are their own singleton cluster; the keeper of each cluster
    is its minimum doc id (deterministic, engine-portable).

    ``keep_by``: optional Column over ``df``'s row — the keeper
    becomes the cluster member with the MAXIMUM value (doc_id
    tiebreak), so a dedup pipeline can keep its best document
    (longest, highest quality score, freshest) instead of an
    arbitrary one — the keep rule real curation pipelines need
    (SemDeDup keeps by centroid distance, RefinedWeb by length).
    One max_by per cluster on the labeled frame — the groupBy rides
    the cluster_id key, no extra corpus pass."""
    cc = connected_components(pairs, a_col, b_col, max_iter)
    labeled = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                         *([keep_by.alias("_kb")] if keep_by is not None
                           else []))
               .join(cc, "doc_id", "left")
               .withColumn("cluster_id",
                           F.coalesce("cluster_id", F.col("doc_id"))))
    if keep_by is None:
        return labeled.select(
            "doc_id", "cluster_id",
            (F.col("doc_id") == F.col("cluster_id"))
            .cast("boolean").alias("is_keep"))
    best = (labeled.groupBy("cluster_id")
            .agg(F.max(F.struct(F.col("_kb"), (-F.col("doc_id"))
                                .alias("_nid"))).alias("_best")))
    return (labeled.join(best, "cluster_id")
            .select("doc_id", "cluster_id",
                    ((F.col("_kb") == F.col("_best._kb"))
                     & (F.col("doc_id") == -F.col("_best._nid")))
                    .alias("is_keep")))
