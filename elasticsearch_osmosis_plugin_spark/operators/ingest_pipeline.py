"""ES ingest pipelines (_ingest): a processor list compiled to pure
Catalyst column transforms, applied to a DataFrame before indexing.

The reference indexes documents verbatim (no ingest node in the 0.90
stack, `ElasticSearchWriterTask.java:40-82` ships entity JSON as-is);
modern ES front-loads a per-document processor pipeline on the ingest
node. The Spark restatement: each processor is a (field -> Column)
rewrite, the whole pipeline folds into ONE projection over the input
(Catalyst collapses adjacent projects), so a 20-processor pipeline
costs the same single codegen'd map as one — per-document, streaming-
safe, no Python in the row path.

Supported processors (each spec is ES's ``{type: {params}}`` shape,
with ES's ``if`` conditional — a SQL predicate over the current row —
honored on every one; two documented mappings: ``rename`` rejects
``if`` (schema-level — use set(copy_from)+remove), and a conditional
``remove`` nulls the field on matching rows instead of dropping the
column):

- ``set`` (value literal or ``copy_from``, ``override``)
- ``rename``, ``remove``
- ``convert`` (integer/long/double/string/boolean, ``target_field``)
- ``lowercase`` / ``uppercase`` / ``trim``
- ``gsub`` (regex replace), ``split`` (regex -> array)
- ``dissect`` (ES dissect patterns ``%{a} %{b}`` with literal
  separators -> one regexp_extract per key)
- ``script`` (a SQL expression over the row, ES's painless analog —
  the same surface runtime_mappings / update_by_query use)
- ``enrich`` (broadcast lookup against a prepared enrich index;
  matched row -> ``target_field`` struct, NULL on no match)

``on_failure`` is not emulated: a processor whose input column is
NULL propagates NULL (Spark semantics), and a malformed ``convert``
yields NULL rather than a dropped document — the documented deviation
(ES's default is to fail the document; NULL-propagation is the
distributed-friendly equivalent of ``ignore_failure: true``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_CONVERT = {"integer": "int", "long": "long", "double": "double",
            "float": "float", "string": "string", "boolean": "boolean"}


# dissect-pattern compilation is shared with the ES|QL DISSECT command
# (functions.textpat) so the two surfaces cannot drift
from elasticsearch_osmosis_plugin_spark.functions.textpat import (  # noqa: E402
    dissect_regex as _dissect_regex,
)


def _apply_one(df: DataFrame, kind: str, p: dict,
               enrich_tables: dict[str, DataFrame] | None = None
               ) -> DataFrame:
    cond = F.expr(p["if"]) if "if" in p else None

    def put(field: str, col: Column) -> DataFrame:
        if cond is not None:
            old = F.col(field) if field in df.columns else F.lit(None)
            col = F.when(cond, col).otherwise(old)
        return df.withColumn(field, col)

    if kind == "set":
        field = p["field"]
        val = (F.col(p["copy_from"]) if "copy_from" in p
               else F.lit(p["value"]))
        if not p.get("override", True) and field in df.columns:
            val = F.coalesce(F.col(field), val)
        return put(field, val)
    if kind == "rename":
        if cond is not None:
            # rename is a schema-level op — a per-row `if` cannot be
            # honored (half the rows can't live under the old name).
            raise ValueError("rename does not support a per-document "
                             "`if` (schema-level operation); use "
                             "set(copy_from)+remove for conditional "
                             "moves")
        return df.withColumnRenamed(p["field"], p["target_field"])
    if kind == "remove":
        fields = p["field"] if isinstance(p["field"], list) else [p["field"]]
        if cond is not None:
            # per-row remove: the column must survive for the rows the
            # condition misses, so a conditional remove maps to
            # set-to-null where the condition holds (the documented
            # DataFrame restatement of per-document field removal).
            out = df
            for f_ in fields:
                out = out.withColumn(
                    f_, F.when(cond, F.lit(None)).otherwise(F.col(f_)))
            return out
        return df.drop(*fields)
    if kind == "convert":
        t = _CONVERT[p["type"]]
        return put(p.get("target_field", p["field"]),
                   F.col(p["field"]).cast(t))
    if kind == "lowercase":
        return put(p.get("target_field", p["field"]),
                   F.lower(F.col(p["field"])))
    if kind == "uppercase":
        return put(p.get("target_field", p["field"]),
                   F.upper(F.col(p["field"])))
    if kind == "trim":
        return put(p.get("target_field", p["field"]),
                   F.trim(F.col(p["field"])))
    if kind == "gsub":
        return put(p.get("target_field", p["field"]),
                   F.regexp_replace(F.col(p["field"]),
                                    p["pattern"], p["replacement"]))
    if kind == "split":
        return put(p.get("target_field", p["field"]),
                   F.split(F.col(p["field"]), p["separator"]))
    if kind == "dissect":
        rx, keys = _dissect_regex(p["pattern"])
        out = df
        for i, k in enumerate(keys, start=1):
            col = F.regexp_extract(F.col(p["field"]), rx, i)
            if cond is not None:
                col = F.when(cond, col).otherwise(F.lit(None).cast("string"))
            out = out.withColumn(k, col)
        return out
    if kind == "script":
        return put(p["target_field"], F.expr(p["source"]))
    if kind == "drop":
        # ES drop processor: remove the DOCUMENT (not a field) when
        # the condition holds — the curation-pipeline filter step.
        # Without an `if` it drops everything (matching ES).
        if cond is None:
            return df.limit(0)
        # a NULL condition must KEEP the row (only a true `if` drops)
        return df.filter(~F.coalesce(cond, F.lit(False)))
    if kind == "date":
        # ES date processor: parse a string field into a timestamp.
        # ``formats``: Spark datetime patterns tried in order (ES
        # tries its format list the same way); unparseable -> NULL
        # (the documented NULL-propagation deviation from ES's
        # fail-the-document default).
        col = F.col(p["field"])
        parsed = None
        for fmt in p.get("formats", ["yyyy-MM-dd'T'HH:mm:ss"]):
            # try_to_timestamp: unparseable -> NULL even under ANSI
            t = F.try_to_timestamp(col, F.lit(fmt))
            parsed = t if parsed is None else F.coalesce(parsed, t)
        return put(p.get("target_field", "@timestamp"), parsed)
    if kind == "enrich":
        # ES enrich processor: broadcast lookup against a prepared
        # enrich index (its FIRST column is the policy's match_field —
        # same convention as operators.esql ENRICH); the matched row's
        # remaining columns land in target_field as a struct, NULL on
        # no match. max_matches=1 enforced by a deterministic min()
        # collapse of duplicate keys. The one non-projection processor
        # — a lookup, exactly like ES's.
        if not enrich_tables or p["policy_name"] not in enrich_tables:
            raise ValueError(
                f"enrich: unknown policy {p.get('policy_name')!r} — "
                "pass enrich_tables={name: DataFrame}")
        tbl = enrich_tables[p["policy_name"]]
        key, rest = tbl.columns[0], tbl.columns[1:]
        if not rest:
            raise ValueError("enrich: policy table needs enrich columns "
                             "beyond its match column")
        target = p["target_field"]
        right = (tbl.select(F.col(key).alias("__ek"),
                            F.struct(*rest).alias(target))
                 .groupBy("__ek").agg(F.min(target).alias(target)))
        out = df.join(F.broadcast(right),
                      F.col(p["field"]) == F.col("__ek"), "left") \
                .drop("__ek")
        if cond is not None:
            out = out.withColumn(target,
                                 F.when(cond, F.col(target)))
        return out
    raise ValueError(f"unsupported ingest processor: {kind}")


def apply_pipeline(df: DataFrame, processors: list[dict],
                   enrich_tables: dict[str, DataFrame] | None = None
                   ) -> DataFrame:
    """Run an ES ingest-pipeline processor list over ``df``. Processors
    apply in order; Catalyst collapses the chain of projections into
    one codegen'd map over the scan (``enrich`` adds a broadcast
    lookup join, the one exception — as in ES)."""
    out = df
    for spec in processors:
        if len(spec) != 1:
            raise ValueError(f"processor spec must be one {{type: params}} "
                             f"entry: {spec}")
        (kind, p), = spec.items()
        out = _apply_one(out, kind, p, enrich_tables)
    return out


def simulate_pipeline(spark, processors: list[dict],
                      docs: list[dict]) -> DataFrame:
    """ES ``_ingest/pipeline/_simulate``: run the pipeline over inline
    documents and return the transformed rows (the debugging surface —
    same compiled plan the real ingest path runs)."""
    df = spark.createDataFrame([tuple(d.values()) for d in docs],
                               list(docs[0].keys()))
    return apply_pipeline(df, processors)
