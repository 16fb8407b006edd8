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
union through the catalog's atomic commit (the Iceberg MERGE analog).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.plans import catalog

DOCSTORE = "docstore"


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


def save_all(spark: SparkSession, root: str, rows: DataFrame,
             supported_kinds: Sequence[str] = ("node", "way")) -> DataFrame:
    """Bulk upsert by (kind, id); returns the quarantine DataFrame of
    unsupported-kind rows (caller decides: log, persist, fail)."""
    good, quarantine = split_supported(rows, supported_kinds)
    good = good.dropDuplicates(["kind", "id"])
    existing = _existing(spark, root)
    if existing is not None:
        keep = existing.join(good.select("kind", "id"), ["kind", "id"], "left_anti")
        merged = keep.unionByName(good)
    else:
        merged = good
    catalog.create_or_replace(merged, root, DOCSTORE,
                              manifest={"op": "save_all"},
                              partition_by=["kind"])
    return quarantine


def save(spark: SparkSession, root: str, row: DataFrame) -> DataFrame:
    """Single save = degenerate 1-row bulk (``EntityDao.java:47-50``)."""
    return save_all(spark, root, row)


def find(spark: SparkSession, root: str, kind: str, id_: int) -> Row:
    got = (catalog.read_table(spark, root, DOCSTORE)
           .filter((F.col("kind") == kind) & (F.col("id") == id_))
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
    (``EntityDao.java:269-280``). Anti-join rewrite."""
    store = _existing(spark, root)
    if store is None:
        return False
    hit = store.filter((F.col("kind") == kind) & (F.col("id") == id_)).limit(1).count()
    if not hit:
        return False
    remaining = store.filter(~((F.col("kind") == kind) & (F.col("id") == id_)))
    catalog.create_or_replace(remaining, root, DOCSTORE,
                              manifest={"op": "delete", "kind": kind, "id": id_},
                              partition_by=["kind"])
    return True


def count_by_kind(spark: SparkSession, root: str) -> DataFrame:
    """Per-kind totals (``EntityCounter`` + count API,
    ``ElasticSearchWriterTask.java:50-54``)."""
    return (catalog.read_table(spark, root, DOCSTORE)
            .groupBy("kind").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("kind"))
