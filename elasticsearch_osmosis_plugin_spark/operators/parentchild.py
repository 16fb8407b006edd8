"""ES parent-child join queries (has_child / has_parent): the join
surface ES implements with in-shard parent/child mapping types
(0.90-era _parent routing; modern `join` field) re-expressed as
DataFrame joins over two co-partitionable tables.

Scale notes (100 TB design point): ES forces parent and child into
the same shard so the join is node-local; the Spark analog is
bucketing both tables by the parent key — then the semi-/agg-join
below is co-partitioned and shuffle-free. Without bucketing it is one
hash-shuffle on the parent key, map-side-combined first for the
score_mode aggregates (children collapse to one row per parent BEFORE
the exchange when the optimizer sees the partial agg). The child
predicate pushes into the child scan; only (child_key, score) columns
survive to the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def has_child(parents: DataFrame, children: DataFrame, parent_key: str,
              child_fk: str, child_filter: Column | None = None,
              child_score: Column | None = None,
              score_mode: str = "none",
              min_children: int = 1) -> DataFrame:
    """Parents having >= ``min_children`` children matching
    ``child_filter`` (ES has_child). ``score_mode``:

    - "none": constant-score semi-join (with min_children=1 a pure
      left-semi — no aggregation at all);
    - "max" | "sum" | "avg" | "min": a ``score`` column aggregated
      from ``child_score`` over each parent's matching children
      (ES's score modes).
    """
    ch = children if child_filter is None else children.filter(child_filter)
    if score_mode == "none":
        if min_children <= 1:
            return parents.join(
                ch.select(F.col(child_fk).alias(parent_key)),
                parent_key, "left_semi")
        counted = (ch.groupBy(F.col(child_fk).alias(parent_key))
                   .agg(F.count(F.lit(1)).alias("_nc"))
                   .filter(F.col("_nc") >= int(min_children))
                   .select(parent_key))
        return parents.join(counted, parent_key, "left_semi")
    if child_score is None:
        raise ValueError(f"score_mode={score_mode!r} needs child_score")
    fns = {"max": F.max, "sum": F.sum, "avg": F.avg, "min": F.min}
    if score_mode not in fns:
        raise ValueError(f"unknown score_mode: {score_mode}")
    agg = (ch.groupBy(F.col(child_fk).alias(parent_key))
           .agg(fns[score_mode](child_score).alias("score"),
                F.count(F.lit(1)).alias("_nc"))
           .filter(F.col("_nc") >= int(min_children))
           .drop("_nc"))
    return parents.join(agg, parent_key, "inner")


def has_parent(parents: DataFrame, children: DataFrame, parent_key: str,
               child_fk: str, parent_filter: Column | None = None) -> DataFrame:
    """Children whose parent matches ``parent_filter`` (ES has_parent,
    constant score — ES only propagates the parent's score with
    score=true, a corpus-global constant per parent; the common form
    is the filter). The filtered parent key set is usually small →
    Catalyst broadcasts it under AQE."""
    pa = parents if parent_filter is None else parents.filter(parent_filter)
    return children.join(pa.select(F.col(parent_key).alias(child_fk)),
                         child_fk, "left_semi")


def parent_id(children: DataFrame, child_fk: str, parent: object) -> DataFrame:
    """ES parent_id query: the children of ONE named parent. A literal
    equality predicate — pushes into the child scan (PushedFilters),
    reads nothing else."""
    return children.filter(F.col(child_fk) == F.lit(parent))


def children_agg(parents: DataFrame, children: DataFrame, parent_key: str,
                 child_fk: str, bucket_col: str, metrics: dict[str, Column],
                 child_filter: Column | None = None) -> DataFrame:
    """ES `children` aggregation: bucket PARENTS by ``bucket_col``,
    then step down into each parent's children and compute ``metrics``
    (name -> aggregate Column over child rows) per bucket, plus ES's
    per-bucket child doc_count. One join + one groupBy: children
    project only (fk, metric inputs), pick up their parent's bucket
    value, and aggregate map-side-combined on the bucket key — the
    parent table contributes just (key, bucket), so with a selective
    parent side Catalyst broadcasts it and the only shuffle is the
    k-bucket frame."""
    ch = children if child_filter is None else children.filter(child_filter)
    pa = parents.select(F.col(parent_key).alias(child_fk),
                        F.col(bucket_col))
    joined = ch.join(pa, child_fk, "inner")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    aggs += [c.alias(name) for name, c in metrics.items()]
    return (joined.groupBy(bucket_col).agg(*aggs)
            .orderBy(F.desc("doc_count"), F.asc(bucket_col)))
