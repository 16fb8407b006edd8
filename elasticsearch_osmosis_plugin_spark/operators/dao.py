"""Document-store DAO over the directory catalog.

Mirrors the reference's ``EntityDao`` surface (save/find/findAll/
delete, per-type routing) and ``EntityCounter`` accounting:

- bulk upsert keyed by (kind, id)      — ``EntityDao.saveAll``,
  ``EntityDao.java:91-122``; single save is a 1-row bulk
  (``EntityDao.java:47-50``)
- type dispatch with warn-and-drop of unsupported kinds, restated as
  an explicit quarantine DataFrame (never silent —
  SURVEY.md §7 watch-list (c); reference logs-and-skips,
  ``EntityDao.java:67-89``)
- point lookup raising when absent      — ``EntityDao.java:180-182``
- multi-get preserving REQUEST order    — ``EntityDao.java:208-236``,
  asserted by ``EntityDaoITest.java:266-280``; implemented as a join
  against posexplode(ids) + orderBy(pos)
- delete by key returning found/absent  — ``EntityDao.java:269-280``
- count by kind                          — ``EntityCounter.java:13-26``

Parquet has no row-level upsert, so saves rewrite via anti-join +
union — but NEVER the whole store (the r1 scale-killer): the store is
hash-bucketed by (kind, id) into ``kind=K/bkt=B`` partitions and an
upsert/delete rewrites ONLY the partitions its keys hash into (the
partition-pruned stand-in for an Iceberg MERGE). O(batch) work per
micro-batch instead of O(store); point lookups prune to one directory.
Each touched partition swaps via rename; partitions are disjoint key
ranges, so a crash mid-swap leaves some keys upserted and others not —
the same partial-bulk semantics as the reference's per-item bulk
responses (``EntityDao.java:104-113``).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.plans import catalog

DOCSTORE = "docstore"
N_STORE_BUCKETS = 16  # id hash-buckets per kind (scale knob)


def _bkt_col() -> F.Column:
    """Stable (kind, id) -> bucket, md5-based so the SAME hash is
    computable driver-side (``_bkt_py``) and in any oracle engine."""
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "\x1f", F.col("kind"), F.col("id").cast("string"))), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(N_STORE_BUCKETS)).cast("int")


def _bkt_py(kind: str, id_: int) -> int:
    h = int(hashlib.md5(f"{kind}\x1f{id_}".encode()).hexdigest()[:8], 16)
    return h % N_STORE_BUCKETS


class DaoError(KeyError):
    """Reference analog: DaoException on absent doc
    (``EntityDao.java:241-243``)."""


def _existing(spark: SparkSession, root: str) -> DataFrame | None:
    return (catalog.read_table(spark, root, DOCSTORE)
            if catalog.table_exists(root, DOCSTORE) else None)


def split_supported(df: DataFrame, supported_kinds: Sequence[str]):
    """Type dispatch: (good, quarantine). The reference warns-and-drops
    relation/bound kinds; we return them explicitly."""
    good = df.filter(F.col("kind").isin(list(supported_kinds)))
    quarantine = df.filter(~F.col("kind").isin(list(supported_kinds)))
    return good, quarantine


def _replace_partitions(merged: DataFrame, root: str,
                        touched: list[tuple[str, int]]) -> None:
    """Write ``merged`` (rows of the touched partitions only) and swap
    exactly those ``kind=K/bkt=B`` directories into the store. A
    touched partition with no surviving rows is removed."""
    final = catalog.table_path(root, DOCSTORE)
    tmp = os.path.join(root, f"_tmp_docstore_{uuid.uuid4().hex[:8]}")
    try:
        merged.write.mode("overwrite").partitionBy("kind", "bkt").parquet(tmp)
        for kind, b in touched:
            src = os.path.join(tmp, f"kind={kind}", f"bkt={b}")
            dst = os.path.join(final, f"kind={kind}", f"bkt={b}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(src, dst)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _pair_pred(touched: list[tuple[str, int]]):
    import functools
    import operator

    return functools.reduce(operator.or_, [
        (F.col("kind") == k) & (F.col("bkt") == b) for k, b in touched])


def save_all(spark: SparkSession, root: str, rows: DataFrame,
             supported_kinds: Sequence[str] = ("node", "way")) -> DataFrame:
    """Bulk upsert by (kind, id); returns the quarantine DataFrame of
    unsupported-kind rows (caller decides: log, persist, fail).

    Scale path: only the (kind, bkt) partitions the batch's keys hash
    into are read (partition-pruned anti-join) and rewritten."""
    good, quarantine = split_supported(rows, supported_kinds)
    good = good.dropDuplicates(["kind", "id"]).withColumn("bkt", _bkt_col())
    existing = _existing(spark, root)
    if existing is None:
        catalog.create_or_replace(good, root, DOCSTORE,
                                  manifest={"op": "save_all",
                                            "n_buckets": N_STORE_BUCKETS},
                                  partition_by=["kind", "bkt"])
        return quarantine
    touched = sorted((r["kind"], r["bkt"]) for r in
                     good.select("kind", "bkt").distinct().collect())
    if not touched:
        return quarantine
    keep = (existing.filter(_pair_pred(touched))  # partition-pruned scan
            .join(good.select("kind", "id"), ["kind", "id"], "left_anti"))
    _replace_partitions(keep.unionByName(good), root, touched)
    return quarantine


def save(spark: SparkSession, root: str, row: DataFrame) -> DataFrame:
    """Single save = degenerate 1-row bulk (``EntityDao.java:47-50``)."""
    return save_all(spark, root, row)


def update(spark: SparkSession, root: str, kind: str, id_: int,
           fields: dict | None = None, script: dict | None = None,
           upsert: dict | None = None) -> Row:
    """ES _update API analog: partial-document merge — read the doc,
    overlay ``fields``, write it back. Raises :class:`DaoError` when
    absent (ES 409/404 semantics: _update does not upsert unless
    asked). The read prunes to the doc's one (kind, bkt) partition and
    the write rewrites only that partition — O(partition), not
    O(store). Returns the merged row.

    ``script``: {col: SQL expression over the CURRENT row's columns}
    — ES's scripted update (``ctx._source.count += 1`` becomes
    ``{"count": "count + 1"}``), evaluated with the same
    painless-to-Catalyst contract as update_by_query; applied after
    ``fields``. ``upsert``: full column->value doc indexed instead
    when the id is absent (ES's upsert body; scripts do NOT run on
    the upsert insert, matching ES's default, non-scripted_upsert
    mode).

    Unknown field names are rejected (the store is a fixed-schema
    parquet table, not a mapping-free JSON blob)."""
    fields = dict(fields or {})
    try:
        current = find(spark, root, kind, id_)  # DaoError if absent
    except DaoError:
        if upsert is None:
            raise
        row = {"kind": kind, "id": int(id_), **upsert}
        schema = catalog.read_table(spark, root, DOCSTORE).drop("bkt").schema
        bad = sorted(set(upsert) - {f.name for f in schema.fields})
        if bad:
            # same contract as the fields/script path: a typo'd upsert
            # column must fail loudly, not vanish
            raise ValueError(f"unknown fields: {bad}")
        save_all(spark, root,
                 spark.createDataFrame(
                     [tuple(row.get(f.name) for f in schema.fields)], schema),
                 supported_kinds=(kind,))
        return find(spark, root, kind, id_)
    bad = sorted((set(fields) | set(script or {})) - set(current.asDict()))
    if bad:
        raise ValueError(f"unknown fields: {bad}")
    if any(k in ("kind", "id", "bkt")
           for k in list(fields) + list(script or {})):
        raise ValueError("cannot update key columns: kind/id/bkt")
    merged = {**current.asDict(), **fields}
    if script:
        one = spark.createDataFrame(
            [tuple(merged[c] for c in current.asDict())],
            catalog.read_table(spark, root, DOCSTORE).schema)
        srow = one.select(
            *[F.expr(expr).alias(c) for c, expr in sorted(script.items())]
        ).collect()[0]
        merged = {**merged, **srow.asDict()}
    row = spark.createDataFrame(
        [tuple(merged[c] for c in current.asDict())],
        catalog.read_table(spark, root, DOCSTORE).schema)
    # the doc's own kind is supported by definition (it exists in the
    # store) — passing it through keeps update working for stores
    # built with non-default supported_kinds instead of silently
    # quarantining the merged row
    save_all(spark, root, row.drop("bkt"), supported_kinds=(kind,))
    return find(spark, root, kind, id_)


def find(spark: SparkSession, root: str, kind: str, id_: int) -> Row:
    got = (catalog.read_table(spark, root, DOCSTORE)
           .filter((F.col("kind") == kind)
                   & (F.col("bkt") == _bkt_py(kind, id_))  # one partition dir
                   & (F.col("id") == id_))
           .limit(2).collect())
    if not got:
        raise DaoError(f"doc not found: kind={kind} id={id_}")
    return got[0]


def find_all(spark: SparkSession, root: str, kind: str,
             ids: Sequence[int]) -> DataFrame:
    """Multi-get; RESULT ORDER == REQUEST ORDER. Missing ids are
    dropped (reference drops non-exists items, ``EntityDao.java:141``)."""
    req = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(ids)], "pos int, id long")
    store = (catalog.read_table(spark, root, DOCSTORE)
             .filter(F.col("kind") == kind))
    return (store.join(F.broadcast(req), "id", "inner")
            .orderBy("pos"))


def delete(spark: SparkSession, root: str, kind: str, id_: int) -> bool:
    """Delete by key; True when the doc existed
    (``EntityDao.java:269-280``). Rewrites ONLY the one (kind, bkt)
    partition the key hashes into."""
    store = _existing(spark, root)
    if store is None:
        return False
    b = _bkt_py(kind, id_)
    part = store.filter((F.col("kind") == kind) & (F.col("bkt") == b))
    hit = part.filter(F.col("id") == id_).limit(1).count()
    if not hit:
        return False
    remaining = part.filter(F.col("id") != id_)
    _replace_partitions(remaining, root, [(kind, b)])
    return True


def count_by_kind(spark: SparkSession, root: str) -> DataFrame:
    """Per-kind totals (``EntityCounter`` + count API,
    ``ElasticSearchWriterTask.java:50-54``)."""
    return (catalog.read_table(spark, root, DOCSTORE)
            .groupBy("kind").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("kind"))
