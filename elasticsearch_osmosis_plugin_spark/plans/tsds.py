"""Time-series data streams (ES TSDS) + the `_downsample` API.

ES 8.7+ ships time-series index mode: documents carry ``@timestamp``,
keyword *dimensions* and numeric *metrics* (``gauge`` / ``counter``),
and the ``_downsample`` API rewrites an index into a coarser-resolution
one where each (dimensions, time-bucket) row stores pre-aggregates —
gauges keep ``min/max/sum/value_count``, counters keep ``last_value``
— so dashboards query years of metrics at a fraction of the bytes.
The reference plugin's role (feed an ES index that then serves
aggregations) is replaced natively: a TSDS here is a parquet layout
with a manifest, and downsampling is one Spark aggregation with the
tmp+rename commit every other index mutation in this engine uses.

Semantics mirrored from ES:

- ingest gate: missing/NULL ``@timestamp`` or any NULL dimension
  rejects the batch BEFORE any write (same rule as
  :mod:`.datastream`).
- ``downsample``: fixed_interval buckets, epoch-aligned; source must
  not already be coarser (ES: can only downsample to a multiple of
  the source interval — enforced, with the same divisibility rule).
- querying: :func:`ts_agg` answers min/max/sum/avg/count over ANY
  requested interval that the stored resolution divides, re-folding
  pre-aggregates exactly (min of mins, sum of sums, count of counts;
  avg = sum/count) — a query on the downsampled index equals the
  same query on the raw index, value for value.
- counters: ``last_value`` per bucket = value at the max timestamp
  (ties: max value — a deterministic rule where ES's is arrival
  order, documented divergence); re-folding picks the last
  sub-bucket's last_value.

Scale notes (100 TB of metrics): raw writes are partitioned by UTC
date (``__day=``) so time-range queries prune directories; the
downsample aggregation is ONE hash aggregate (map-side partials —
cardinality = n_series x buckets, the minimum possible), written
partitioned by the SAME date scheme. ``ts_agg`` always reads the
coarsest stored resolution that divides the request — bytes scanned
shrink by the downsample factor, the ES design's whole point.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

TS_COL = "@timestamp"
_IVAL_RE = re.compile(r"^(\d+)(s|m|h|d)$")
_UNIT_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def interval_seconds(interval: str) -> int:
    m = _IVAL_RE.match(interval)
    if not m:
        raise ValueError(f"tsds: bad fixed_interval {interval!r} "
                         "(use Ns/Nm/Nh/Nd)")
    return int(m.group(1)) * _UNIT_S[m.group(2)]


def _dir(root: str, name: str) -> str:
    return os.path.join(root, name)


def _manifest(root: str, name: str) -> str:
    return os.path.join(_dir(root, name), "tsds.json")


def _read_man(root: str, name: str) -> dict[str, Any]:
    with open(_manifest(root, name)) as f:
        return json.load(f)


def _write_man(root: str, name: str, man: dict[str, Any]) -> None:
    tmp = _manifest(root, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, _manifest(root, name))


def create_tsds(root: str, name: str, *,
                dimensions: Iterable[str],
                metrics: dict[str, str],
                ts_col: str = TS_COL) -> dict[str, Any]:
    """Create the series store. ``metrics``: column -> gauge|counter."""
    bad = [k for k, v in metrics.items() if v not in ("gauge", "counter")]
    if bad:
        raise ValueError(f"tsds: metric type must be gauge|counter: {bad}")
    if os.path.exists(_manifest(root, name)):
        raise ValueError(f"tsds {name!r} already exists")
    os.makedirs(_dir(root, name), exist_ok=True)
    man = {"name": name, "ts_col": ts_col,
           "dimensions": sorted(dimensions), "metrics": dict(metrics),
           "downsamples": {}}          # interval -> relative dir
    _write_man(root, name, man)
    return man


def append_tsds(spark: SparkSession, root: str, name: str,
                df: DataFrame) -> int:
    """Ingest-gated append into the raw store, day-partitioned."""
    man = _read_man(root, name)
    ts, dims = man["ts_col"], man["dimensions"]
    need = [ts, *dims, *man["metrics"]]
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise ValueError(f"tsds: missing columns {missing}")
    gate = F.col(ts).isNull()
    for d in dims:
        gate = gate | F.col(d).isNull()
    # one aggregation job answers both the gate and the return count;
    # non-deterministic sources should be persisted by the caller (the
    # gate pass and the write are separate jobs, like any
    # validate-then-write pipeline)
    n_total, n_bad = df.agg(
        F.count(F.lit(1)), F.count(F.when(gate, F.lit(1)))).collect()[0]
    if n_bad:
        raise ValueError(
            f"tsds: {n_bad} rows with NULL {ts!r}/dimension — batch "
            "rejected before any write (ES TSDS ingest gate)")
    out = df.select(*need) \
        .withColumn("__day", F.date_format(F.col(ts).cast("timestamp"),
                                           "yyyy-MM-dd"))
    raw = os.path.join(_dir(root, name), "raw")
    out.write.mode("append").partitionBy("__day").parquet(raw)
    return int(n_total)


def _bucket_col(ts_col: str, secs: int):
    from ..functions.analysis import time_bucket

    return time_bucket(ts_col, secs)


def _read_raw(spark: SparkSession, root: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_dir(root, name), "raw"))


def downsample(spark: SparkSession, root: str, name: str,
               fixed_interval: str, *,
               source_interval: str | None = None) -> str:
    """ES `POST /<index>/_downsample`: materialize the rollup.

    ``source_interval=None`` rolls up the raw store; otherwise rolls
    up an EXISTING downsample (must divide the target — ES's rule).
    Atomic: tmp dir + rename; the manifest commits last.
    """
    man = _read_man(root, name)
    secs = interval_seconds(fixed_interval)
    ts, dims, metrics = man["ts_col"], man["dimensions"], man["metrics"]
    if fixed_interval in man["downsamples"]:
        raise ValueError(f"tsds: downsample {fixed_interval} exists")
    if source_interval is None:
        src = _read_raw(spark, root, name)
        pre = False
    else:
        s = interval_seconds(source_interval)
        if source_interval not in man["downsamples"]:
            raise ValueError(f"tsds: no downsample {source_interval}")
        if secs % s:
            raise ValueError(
                f"tsds: {fixed_interval} is not a multiple of "
                f"{source_interval} (ES downsample divisibility rule)")
        src = spark.read.parquet(os.path.join(
            _dir(root, name), man["downsamples"][source_interval]))
        pre = True

    bucket = _bucket_col(ts if not pre else "__bucket", secs)
    aggs = []
    for col, kind in metrics.items():
        if kind == "gauge":
            if pre:
                aggs += [F.min(f"{col}_min").alias(f"{col}_min"),
                         F.max(f"{col}_max").alias(f"{col}_max"),
                         F.sum(f"{col}_sum").alias(f"{col}_sum"),
                         F.sum(f"{col}_value_count")
                          .alias(f"{col}_value_count")]
            else:
                aggs += [F.min(col).alias(f"{col}_min"),
                         F.max(col).alias(f"{col}_max"),
                         F.sum(col).alias(f"{col}_sum"),
                         F.count(col).alias(f"{col}_value_count")]
        else:                            # counter: last + first observed
            # the order key must be the SOURCE time column — grouping
            # happens on a fresh "__nb" column below precisely so the
            # source "__bucket" stays visible here when re-downsampling
            # (else max-by-time degenerates to max-by-value).
            # first_value is an engine EXTENSION over ES's
            # last_value-only counter rollup: with both ends stored,
            # ts_rate on the rollup reconstructs the exact reset-free
            # rate (internal last-first + boundary first-prev_last
            # deltas) instead of losing each span's internal rise.
            last_src = f"{col}_last_value" if pre else col
            first_src = f"{col}_first_value" if pre else col
            if pre and first_src not in src.columns:
                raise ValueError(
                    f"tsds: source downsample {source_interval} "
                    "predates counter first_value capture — re-run "
                    "it before re-downsampling")
            t = F.col("__bucket" if pre else ts)
            aggs.append(F.max(F.struct(t.alias("t"),
                                       F.col(last_src).alias("v")))
                        .getField("v").alias(f"{col}_last_value"))
            aggs.append(F.min(F.struct(t.alias("t"),
                                       F.col(first_src).alias("v")))
                        .getField("v").alias(f"{col}_first_value"))
    rolled = (src.withColumn("__nb", bucket)
              .groupBy("__nb", *dims).agg(*aggs)
              .withColumnRenamed("__nb", "__bucket")
              .withColumn("__day", F.date_format("__bucket", "yyyy-MM-dd")))
    rel = f"downsample-{fixed_interval}"
    dst = os.path.join(_dir(root, name), rel)
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    rolled.write.mode("overwrite").partitionBy("__day").parquet(tmp)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.replace(tmp, dst)
    man["downsamples"][fixed_interval] = rel
    _write_man(root, name, man)
    return dst


def _pick_resolution(man: dict[str, Any], secs: int) -> str | None:
    """Coarsest stored downsample whose interval divides the request
    (fewest bytes scanned); None -> raw."""
    best = None
    for ival in man["downsamples"]:
        s = interval_seconds(ival)
        if secs % s == 0 and (best is None
                              or s > interval_seconds(best)):
            best = ival
    return best


def ts_agg(spark: SparkSession, root: str, name: str,
           fixed_interval: str, *,
           metric: str, agg: str,
           by_dimensions: bool = True,
           resolution: str | None = "auto") -> DataFrame:
    """min/max/sum/avg/count of a metric per (bucket[, dimensions]).

    ``resolution="auto"`` reads the coarsest stored rollup that
    divides the request; ``None`` forces raw; an explicit interval
    forces that rollup. Counter metrics support only ``last_value``.
    Result is identical whichever resolution serves it (tested).
    """
    man = _read_man(root, name)
    secs = interval_seconds(fixed_interval)
    kind = man["metrics"].get(metric)
    if kind is None:
        raise ValueError(f"tsds: unknown metric {metric!r}")
    valid = (("last_value",) if kind == "counter"
             else ("min", "max", "sum", "avg", "value_count"))
    if agg not in valid:
        raise ValueError(f"tsds: {kind} metric supports {valid}, "
                         f"not {agg!r}")
    if resolution == "auto":
        resolution = _pick_resolution(man, secs)
    dims = man["dimensions"] if by_dimensions else []
    if resolution is None:
        src = _read_raw(spark, root, name)
        b = _bucket_col(man["ts_col"], secs)
        col = F.col(metric)
        expr = {"min": F.min(col), "max": F.max(col), "sum": F.sum(col),
                "avg": F.avg(col), "value_count": F.count(col),
                "last_value": F.max(F.struct(
                    F.col(man["ts_col"]).alias("t"),
                    col.alias("v"))).getField("v")}[agg]
    else:
        s = interval_seconds(resolution)
        if secs % s:
            raise ValueError(f"tsds: stored {resolution} does not "
                             f"divide {fixed_interval}")
        src = spark.read.parquet(os.path.join(
            _dir(root, name), man["downsamples"][resolution]))
        b = _bucket_col("__bucket", secs)
        expr = {
            "min": F.min(f"{metric}_min"),
            "max": F.max(f"{metric}_max"),
            "sum": F.sum(f"{metric}_sum"),
            "value_count": F.sum(f"{metric}_value_count"),
            "avg": (F.sum(f"{metric}_sum")
                    / F.sum(f"{metric}_value_count")),
            "last_value": F.max(F.struct(
                F.col("__bucket").alias("t"),
                F.col(f"{metric}_last_value").alias("v"))).getField("v"),
        }[agg]
    return (src.withColumn("__b", b).groupBy("__b", *dims)
            .agg(expr.alias(agg))
            .select(F.col("__b").alias("bucket"), *dims, agg))


class TsdsRef:
    """Resolver value for ES|QL's ``TS`` command: points at a
    persisted TSDS and carries the manifest's series metadata (the
    TS command needs the FULL dimension set to form ``_tsid`` — the
    BY keys alone would under-group and corrupt per-series rate
    windows). Pass as a ``tables`` entry: ``esql(spark, "TS m | ...",
    {"m": TsdsRef(root, "m")})``."""

    def __init__(self, root: str, name: str):
        man = _read_man(root, name)
        self.root, self.name = root, name
        self.ts_col: str = man["ts_col"]
        self.dimensions: list[str] = list(man["dimensions"])
        self.metrics: dict[str, str] = dict(man["metrics"])

    def load(self, spark: SparkSession) -> DataFrame:
        return _read_raw(spark, self.root, self.name)


def tsds_stats(root: str, name: str) -> dict[str, Any]:
    man = _read_man(root, name)
    return {"name": man["name"], "dimensions": man["dimensions"],
            "metrics": man["metrics"],
            "downsamples": sorted(man["downsamples"])}


def ts_rate(spark: SparkSession, root: str, name: str,
            fixed_interval: str, *, metric: str,
            resolution: str | None = "auto") -> DataFrame:
    """ES `rate` aggregation over a counter metric: per (series,
    bucket), the sum of positive deltas divided by the bucket width in
    seconds — with ES's counter-RESET rule (a value drop means the
    counter restarted, so the post-reset value itself is the delta,
    not a negative step).

    ``resolution`` picks the store: ``None``/``"raw"`` forces raw
    observations; ``"auto"`` (default) uses the coarsest stored
    downsample whose interval divides the request — the 100 TB path:
    counter rollups here keep BOTH ends of each span (``first_value``
    an engine extension over ES's last_value-only rollup), so a span
    contributes its internal rise (last − first) plus the boundary
    delta from the previous span's last — telescoping back to raw's
    positive-delta sum EXACTLY unless a reset hides inside a span
    whose last still exceeds its first (then the rollup undercounts,
    never overcounts — the standard downsampled-counter caveat; pass
    ``resolution="raw"`` when that matters). An explicit interval
    (e.g. ``"1h"``) selects that stored downsample.

    One window pass partitioned by the series key — the shuffle moves
    each series to one task ordered by time, exactly the TSDB storage
    order (rollup mode scans the downsample's bytes instead of raw).
    """
    from pyspark.sql import Window

    man = _read_man(root, name)
    if man["metrics"].get(metric) != "counter":
        raise ValueError(f"tsds: rate needs a counter metric, "
                         f"{metric!r} is {man['metrics'].get(metric)}")
    secs = interval_seconds(fixed_interval)
    ts, dims = man["ts_col"], man["dimensions"]

    last_c, first_c = f"{metric}_last_value", f"{metric}_first_value"
    pick, src = None, None
    if resolution == "auto":
        pick = _pick_resolution(man, secs)
        if pick is not None:
            src = spark.read.parquet(os.path.join(
                _dir(root, name), man["downsamples"][pick]))
            if first_c not in src.columns:
                # rollup predates first_value capture: auto must keep
                # previously-working calls working — degrade to raw
                # (exact) instead of erroring
                pick, src = None, None
    elif resolution not in (None, "raw"):
        if resolution not in man["downsamples"]:
            raise ValueError(f"tsds: no downsample {resolution}")
        if secs % interval_seconds(resolution):
            raise ValueError(
                f"tsds: {fixed_interval} is not a multiple of "
                f"{resolution}")
        pick = resolution
        src = spark.read.parquet(os.path.join(
            _dir(root, name), man["downsamples"][pick]))
        if first_c not in src.columns:
            raise ValueError(
                f"tsds: downsample {pick} predates counter first_value "
                "capture — re-run downsample() or use resolution='raw'")

    if pick is None:
        src = _read_raw(spark, root, name)
        w = Window.partitionBy(*dims).orderBy(F.col(ts).cast("timestamp"))
        prev = F.lag(metric).over(w)
        delta = F.when(prev.isNull(), F.lit(None)) \
            .when(F.col(metric) >= prev, F.col(metric) - prev) \
            .otherwise(F.col(metric))       # reset: restart from 0
        return (src.withColumn("__delta", delta)
                .withColumn("__b", _bucket_col(ts, secs))
                .groupBy(F.col("__b").alias("bucket"), *dims)
                .agg((F.sum("__delta") / F.lit(float(secs)))
                     .alias("rate")))

    # rollup mode: each span carries (first_value, last_value), so the
    # span's contribution is its INTERNAL rise (last − first, reset
    # rule if the span ends lower) plus the BOUNDARY delta from the
    # previous span's last_value to this span's first_value (same
    # reset rule; the series' first span has no boundary) — the two
    # telescoped sums reproduce raw's positive-delta sum exactly when
    # resets don't hide inside a span.
    w = Window.partitionBy(*dims) \
        .orderBy(F.col("__bucket").cast("timestamp"))
    prev_last = F.lag(last_c).over(w)
    boundary = F.when(prev_last.isNull(), F.lit(0.0)) \
        .when(F.col(first_c) >= prev_last, F.col(first_c) - prev_last) \
        .otherwise(F.col(first_c))
    internal = F.when(F.col(last_c) >= F.col(first_c),
                      F.col(last_c) - F.col(first_c)) \
        .otherwise(F.col(last_c))
    return (src.withColumn("__delta", boundary + internal)
            .withColumn("__b", _bucket_col("__bucket", secs))
            .groupBy(F.col("__b").alias("bucket"), *dims)
            .agg((F.sum("__delta") / F.lit(float(secs))).alias("rate")))
