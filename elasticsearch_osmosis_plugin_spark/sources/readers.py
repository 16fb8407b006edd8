"""Sources & sinks (SURVEY §2.C scans/sources/sinks).

The reference's only source is the Osmosis push stream and its only
sink is the ES bulk API. A Spark engine exposes table scans instead;
these helpers add the operational behaviors the reference had:

- schema-enforced reads (never inferSchema in prod paths);
- partial-failure tolerance: corrupt rows land in a quarantine
  DataFrame instead of failing the job or vanishing (reference
  logs-and-skips, ``EntityDao.java:98-101``; we refuse silent drops);
- Iceberg/Delta gated behind import-try (jars not in this container —
  the catalog layer in plans.catalog provides the atomic-commit
  semantics locally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType, StringType


def read_parquet(spark: SparkSession, path: str,
                 columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv_quarantined(spark: SparkSession, path: str, schema: StructType,
                         **options):
    """CSV scan returning (good, quarantine): malformed rows are
    captured via PERMISSIVE mode + _corrupt_record, split explicitly."""
    schema_q = StructType(list(schema.fields)
                          + [StructField("_corrupt_record", StringType(), True)])
    df = (spark.read.schema(schema_q)
          .options(mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record",
                   header="true", **options)
          .csv(path).cache())
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()) \
            .select("_corrupt_record")
    return good, bad


def read_json_quarantined(spark: SparkSession, path: str, schema: StructType):
    schema_q = StructType(list(schema.fields)
                          + [StructField("_corrupt_record", StringType(), True)])
    df = (spark.read.schema(schema_q)
          .options(mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
          .json(path).cache())
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def iceberg_available(spark: SparkSession) -> bool:
    """Iceberg needs its runtime jar on the classpath; gate it."""
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Catalog-table read when Iceberg/Delta is wired; parquet-dir
    fallback otherwise (this container)."""
    if "/" not in ref and iceberg_available(spark):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)
