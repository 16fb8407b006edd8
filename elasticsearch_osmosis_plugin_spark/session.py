"""SparkSession bootstrap + health gate.

Reference analog: ``ElasticsearchClientBuilder.build/checkConnection``
(``ElasticsearchClientBuilder.java:56-63,115-121``) — build the cluster
client, fail fast if the cluster has no data nodes. Here: build the
session with scale-appropriate confs and assert usable parallelism.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "elasticsearch_osmosis_plugin_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # multi-wave file splits: ~3 tasks per core smooths stragglers in
    # scan-heavy stages (a single-wave split pins the stage wall to its
    # slowest task). Floored by openCostInBytes, so tiny inputs don't
    # explode into micro-tasks.
    if "spark.sql.files.minPartitionNum" not in (extra_conf or {}):
        spark.conf.set("spark.sql.files.minPartitionNum",
                       str(3 * spark.sparkContext.defaultParallelism))
    check_connection(spark)
    return spark


def check_connection(spark: SparkSession, min_parallelism: int = 1) -> None:
    """Health gate: fail fast when the cluster offers no parallelism
    (reference: fail when 0 data nodes,
    ``ElasticsearchClientBuilder.java:115-121``)."""
    par = spark.sparkContext.defaultParallelism
    if par < min_parallelism:
        raise RuntimeError(
            f"cluster health gate failed: defaultParallelism={par} < {min_parallelism}"
        )
