"""ES Transforms API (`_transform`): pivot and latest, batch + continuous.

Elasticsearch transforms convert a source index into an
entity-centric destination index. Two flavors:

- **pivot** — ``group_by`` (terms / histogram / date_histogram) +
  ``aggregations`` (avg / sum / min / max / value_count / cardinality /
  percentiles), continuously maintained per bucket.
- **latest** — the most recent document per ``unique_key`` under a
  ``sort`` field.

The reference plugin (`ElasticSearchWriterTask.java`) only ships raw
entities to ES, where transform jobs run engine-side; here the
transform engine is native Spark:

- ``compile_pivot`` / ``compile_latest`` build the destination frame
  as ONE declarative plan: a single map-side-combinable ``groupBy``
  for pivot (partial aggregation keeps the shuffle to one combined row
  per bucket per task), and a ``max_by(struct(...), struct(sort,
  tie))`` single-shuffle reduction for latest — no window, no
  row_number sort of whole partitions.
- ``run_batch`` commits the destination through the catalog's atomic
  tmp+rename protocol (complete or absent, never partial — the same
  visibility barrier ES gives via index aliasing).
- ``continuous_transform`` is ES's checkpoint loop on Structured
  Streaming: each micro-batch identifies the CHANGED bucket keys (ES:
  "composite agg filtered to entities whose sync field advanced"),
  recomputes exactly those buckets from the full source, and upserts
  them into the destination. Unchanged buckets are never touched, so a
  checkpoint costs O(changed entities), not O(index) — the property
  that makes ES transforms viable on large indices, preserved here.

Scale notes (100 TB): the changed-key set is bounded by the
micro-batch (broadcast into the recompute filter — map-side semi-join,
no shuffle of the source); bucket recompute reuses the source's
parquet pruning (the group key filter pushes down when the key is a
plain column); the destination upsert rewrites one parquet table of
NUM-BUCKETS size, i.e. entity-cardinality — orders of magnitude
smaller than the source by construction.
"""
from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import catalog

# ---------------------------------------------------------------- group_by

_CAL = {"minute": "minute", "hour": "hour", "day": "day", "week": "week",
        "month": "month", "quarter": "quarter", "year": "year"}

_FIXED_US = {"ms": 1000, "s": 1_000_000, "m": 60_000_000,
             "h": 3_600_000_000, "d": 86_400_000_000}


def _fixed_us(interval: str) -> int:
    """``"90m"`` -> microseconds. ES fixed_interval units ms/s/m/h/d."""
    for unit in sorted(_FIXED_US, key=len, reverse=True):
        if interval.endswith(unit):
            return int(interval[: -len(unit)]) * _FIXED_US[unit]
    raise ValueError(f"unsupported fixed_interval: {interval!r}")


def group_key_col(spec: dict[str, Any]):
    """One ES transform ``group_by`` entry -> a Catalyst key column.

    terms -> the raw column; histogram -> floor(v / interval) *
    interval; date_histogram -> date_trunc (calendar) or epoch-floored
    microseconds (fixed). All whole-stage-codegen expressions.
    """
    if len(spec) != 1:
        raise ValueError(f"group_by entry needs exactly one type: {spec}")
    (kind, body), = spec.items()
    field = body["field"]
    if kind == "terms":
        return F.col(field)
    if kind == "histogram":
        iv = float(body["interval"])
        return (F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)).cast("double")
    if kind == "date_histogram":
        if "calendar_interval" in body:
            unit = _CAL[body["calendar_interval"]]
            return F.date_trunc(unit, F.col(field).cast("timestamp"))
        us = _fixed_us(body["fixed_interval"])
        e = F.unix_micros(F.col(field).cast("timestamp"))
        return F.timestamp_micros((F.floor(e / F.lit(us)) * F.lit(us))
                                  .cast("long"))
    raise ValueError(f"unsupported group_by type: {kind}")


# ------------------------------------------------------------ aggregations

def agg_col(name: str, spec: dict[str, Any]):
    """One ES transform ``aggregations`` entry -> an aggregate column.

    value_count is null-skipping (count of extracted values, not
    docs); cardinality is exact countDistinct (ES uses HLL — a sketch
    is an approximation of this answer, so exact is strictly
    conformant); percentiles uses Spark's exact interpolated
    percentile (ES TDigest approximates the same definition).
    """
    if len(spec) != 1:
        raise ValueError(f"agg {name!r} needs exactly one type: {spec}")
    (kind, body), = spec.items()
    field = body.get("field")
    c = F.col(field) if field is not None else None
    if kind == "avg":
        return F.avg(c).alias(name)
    if kind == "sum":
        return F.sum(c).alias(name)
    if kind == "min":
        return F.min(c).alias(name)
    if kind == "max":
        return F.max(c).alias(name)
    if kind == "value_count":
        return F.count(c).alias(name)
    if kind == "cardinality":
        return F.countDistinct(c).alias(name)
    if kind == "percentiles":
        pcts = [float(p) / 100.0 for p in body.get("percents",
                                                   (1, 5, 25, 50, 75, 95, 99))]
        return F.percentile(c, F.lit(pcts)).alias(name)
    raise ValueError(f"unsupported pivot aggregation: {kind}")


# ----------------------------------------------------------------- compile

def compile_pivot(df: DataFrame, pivot: dict[str, Any]) -> DataFrame:
    """``{"group_by": {...}, "aggregations": {...}}`` -> destination
    frame, one groupBy (one shuffle, map-side combined)."""
    keys = [group_key_col(spec).alias(name)
            for name, spec in pivot["group_by"].items()]
    aggs = [agg_col(name, spec)
            for name, spec in pivot["aggregations"].items()]
    if not aggs:
        raise ValueError("pivot needs at least one aggregation")
    return df.groupBy(*keys).agg(*aggs)


def compile_latest(df: DataFrame, latest: dict[str, Any],
                   tie_col: str | None = None) -> DataFrame:
    """``{"unique_key": [...], "sort": field}`` -> one row per key:
    the document with the greatest sort value (ties broken by
    ``tie_col`` for determinism — ES's own latest is
    last-writer-wins-arbitrary on ties, so any deterministic refinement
    conforms). Single max_by reduction; no window sort."""
    keys = list(latest["unique_key"])
    sort = latest["sort"]
    payload = [c for c in df.columns if c not in keys]
    ordc = (F.struct(F.col(sort), F.col(tie_col)) if tie_col
            else F.col(sort))
    top = (df.groupBy(*[F.col(k) for k in keys])
             .agg(F.max_by(F.struct(*[F.col(c) for c in payload]),
                           ordc).alias("_doc")))
    return top.select(*keys, *[F.col(f"_doc.{c}").alias(c)
                               for c in payload])


def compile_transform(df: DataFrame, config: dict[str, Any]) -> DataFrame:
    """Dispatch on the config's ``pivot`` / ``latest`` section (exactly
    one, like ES's transform PUT body)."""
    has_p, has_l = "pivot" in config, "latest" in config
    if has_p == has_l:
        raise ValueError("transform config needs exactly one of "
                         "'pivot' or 'latest'")
    if has_p:
        return compile_pivot(df, config["pivot"])
    return compile_latest(df, config["latest"],
                          tie_col=config.get("tie_breaker"))


def preview(df: DataFrame, config: dict[str, Any],
            size: int = 100) -> list[dict[str, Any]]:
    """ES ``_transform/_preview``: first ``size`` destination docs."""
    rows = compile_transform(df, config).limit(size).collect()
    return [r.asDict(recursive=True) for r in rows]


# ------------------------------------------------------------------- batch

def run_batch(df: DataFrame, config: dict[str, Any], dest_root: str,
              dest_name: str) -> dict[str, Any]:
    """One-shot transform: compute and atomically publish the
    destination table (tmp+rename commit via the catalog)."""
    out = compile_transform(df, config)
    catalog.create_or_replace(out, dest_root, dest_name,
                              manifest={"transform": config})
    n = out.count()
    return {"dest": catalog.table_path(dest_root, dest_name),
            "documents_indexed": n}


# -------------------------------------------------------------- continuous

def _group_key_names(config: dict[str, Any]) -> list[str]:
    if "pivot" in config:
        return list(config["pivot"]["group_by"].keys())
    return list(config["latest"]["unique_key"])


def continuous_transform(stream_df: DataFrame,
                         source_reader: Callable[[], DataFrame],
                         config: dict[str, Any], dest_root: str,
                         dest_name: str, checkpoint: str):
    """ES continuous transform on Structured Streaming.

    Per micro-batch (== ES checkpoint):

    1. derive the CHANGED destination bucket keys from the batch alone
       (apply the group_by key expressions to the new rows, distinct —
       bounded by the batch, collected as ES collects its changed
       composite pages);
    2. recompute exactly those buckets against the full source
       (``source_reader()``; the key filter is a broadcast semi-join /
       pushed-down In for plain columns);
    3. upsert into the destination: drop the changed keys, union the
       recomputed rows, atomic tmp+rename publish.

    Unchanged buckets are byte-identical across checkpoints — the
    destination converges to exactly ``run_batch`` of the final source
    (asserted by ``test_transforms.py::test_continuous_matches_batch``).
    """
    key_names = _group_key_names(config)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if "pivot" in config:
            keyed = batch_df.select(*[
                group_key_col(spec).alias(name)
                for name, spec in config["pivot"]["group_by"].items()])
        else:
            keyed = batch_df.select(*key_names)
        changed = keyed.distinct()
        fresh = compile_transform(source_reader(), config)
        recomputed = fresh.join(F.broadcast(changed), on=key_names,
                                how="left_semi")
        if catalog.table_exists(dest_root, dest_name):
            prior = catalog.read_table(spark, dest_root, dest_name)
            kept = prior.join(F.broadcast(changed), on=key_names,
                              how="left_anti")
            out = kept.unionByName(recomputed)
        else:
            out = recomputed
        catalog.create_or_replace(out.localCheckpoint(eager=True),
                                  dest_root, dest_name,
                                  manifest={"transform": config,
                                        "checkpoint": epoch_id})

    return (stream_df.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True))


# -------------------------------------------------------------- stats shim

def transform_stats(dest_root: str, dest_name: str) -> dict[str, Any]:
    """ES ``_transform/<id>/_stats`` analog from the destination
    manifest (documents_indexed + last checkpoint id)."""
    man = catalog.read_manifest(dest_root, dest_name)
    return {"id": dest_name,
            "checkpointing": {"last": man.get("checkpoint")},
            "transform": man.get("transform")}
