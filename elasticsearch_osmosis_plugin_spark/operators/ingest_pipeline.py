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
- ``append`` / ``join`` / ``sort`` (array field ops; append creates
  the field when missing, ``allow_duplicates: false`` -> array_union)
- ``json`` (flat object -> ``map<string,string>``; ``add_to_root``
  rejected — schema-less row widening), ``kv`` (``str_to_map`` with
  optional key ``prefix``), ``csv`` (quote-aware via ``from_csv``,
  all-string targets)
- ``grok`` (ES grok %{SYNTAX:name:type} with first-matching-pattern-
  wins across the pattern list; regex table shared with ES|QL GROK)
- ``bytes`` ("1.5kb" -> 1536), ``html_strip`` (tags + the five XML
  entities), ``urldecode``, ``uri_parts`` (scheme/domain/path/query/
  fragment/user_info struct via parse_url)
- ``fingerprint`` (md5/sha1/sha256 hex over sorted "name=value"
  pairs — deterministic engine convention; ES's exact byte layout is
  implementation-private)
- ``fail`` (aborts the JOB when any row trips the ``if`` — the batch
  analog of ES's fail-the-document)

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
    if kind == "append":
        field = p["field"]
        vals = p["value"] if isinstance(p["value"], list) else [p["value"]]
        add = F.array(*[F.lit(v) for v in vals])
        if field in df.columns:
            # allow_duplicates:false only skips NEW values already
            # present (ES appends value-by-value, so an existing
            # [a,a] + [b] keeps both a's: [a,a,b]) — array_union
            # would also dedupe the pre-existing duplicates.
            joined = (F.concat(F.col(field),
                               F.array_except(add, F.col(field)))
                      if not p.get("allow_duplicates", True)
                      else F.concat(F.col(field), add))
            col = F.when(F.col(field).isNull(), add).otherwise(joined)
        else:
            col = add
        return put(field, col)
    if kind == "join":
        return put(p.get("target_field", p["field"]),
                   F.array_join(F.col(p["field"]), p["separator"]))
    if kind == "sort":
        return put(p.get("target_field", p["field"]),
                   F.sort_array(F.col(p["field"]),
                                asc=p.get("order", "asc") != "desc"))
    if kind == "json":
        # flat JSON object -> map<string,string> (ES parses arbitrary
        # nesting; a DataFrame column needs ONE type, so the flat-map
        # form is the supported shape — documented; add_to_root would
        # need a schema and is rejected)
        if p.get("add_to_root"):
            raise ValueError("json: add_to_root is not supported "
                             "(schema-less row widening) — read into "
                             "target_field and reference map keys")
        return put(p.get("target_field", p["field"]),
                   F.from_json(F.col(p["field"]), "map<string,string>"))
    if kind == "kv":
        col = F.str_to_map(F.col(p["field"]),
                           F.lit(p.get("field_split", " ")),
                           F.lit(p.get("value_split", "=")))
        if p.get("prefix"):
            col = F.map_from_arrays(
                F.transform(F.map_keys(col),
                            lambda k: F.concat(F.lit(p["prefix"]), k)),
                F.map_values(col))
        return put(p.get("target_field", p["field"]), col)
    if kind == "csv":
        # proper quote-aware CSV via from_csv (ES uses a real CSV
        # parser too); all target fields land as strings, convert
        # downstream like ES does
        targets = p["target_fields"]
        schema = ", ".join(f"`{t}` string" for t in targets)
        opts = {"sep": p.get("separator", ","),
                "quote": p.get("quote", '"')}
        parsed = F.from_csv(F.col(p["field"]), schema, opts)
        out = df
        for t in targets:
            c = parsed.getField(t)
            if cond is not None:
                c = F.when(cond, c)
            out = out.withColumn(t, c)
        return out
    if kind == "grok":
        # first matching pattern wins (ES tries the list in order);
        # regex + group plumbing shared with ES|QL's GROK command
        from elasticsearch_osmosis_plugin_spark.functions.textpat import (
            grok_regex,
        )

        pats = p["patterns"] if isinstance(p["patterns"], list) \
            else [p["patterns"]]
        src = F.col(p["field"])
        out = df
        seen: dict[str, Column] = {}
        prior = F.lit(False)    # an earlier pattern already matched
        for pat in pats:
            rx, typed = grok_regex(pat)
            eligible = src.rlike(rx) & ~prior
            prior = prior | src.rlike(rx)
            for i, (name, ftype) in enumerate(typed):
                c = F.when(eligible, F.regexp_extract(src, rx, i + 1))
                if ftype in ("int", "long"):
                    c = c.cast("long")
                elif ftype in ("float", "double"):
                    c = c.cast("double")
                seen[name] = (c if name not in seen
                              else F.coalesce(seen[name], c))
        for name, c in seen.items():
            if cond is not None:
                c = F.when(cond, c)
            out = out.withColumn(name, c)
        return out
    if kind == "bytes":
        # "1kb" -> 1024 (ES byte-size units, case-insensitive,
        # optional fraction); unparseable -> NULL
        src = F.trim(F.lower(F.col(p["field"])))
        num = F.regexp_extract(src, r"^([0-9]*\.?[0-9]+)\s*"
                                    r"(b|kb|mb|gb|tb|pb)?$", 1)
        unit = F.regexp_extract(src, r"^([0-9]*\.?[0-9]+)\s*"
                                     r"(b|kb|mb|gb|tb|pb)?$", 2)
        mult = (F.when(unit == "kb", 1024).when(unit == "mb", 1024**2)
                .when(unit == "gb", 1024**3).when(unit == "tb", 1024**4)
                .when(unit == "pb", 1024**5).otherwise(1))
        return put(p.get("target_field", p["field"]),
                   F.when(num != "", (num.cast("double")
                                      * mult).cast("long")))
    if kind == "html_strip":
        # tag removal + the five XML entities (Lucene's char filter
        # also decodes numeric entities — documented simplification)
        c = F.regexp_replace(F.col(p["field"]), r"<[^>]*>", "")
        # &amp; must decode LAST: a single-pass char filter never
        # re-reads its own output, so '&amp;lt;' is '&lt;' (not '<') —
        # decoding & first would feed the freshly-made '&lt;' to the
        # next replace (double decode)
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                        ("&quot;", '"'), ("&apos;", "'"),
                        ("&nbsp;", " "), ("&amp;", "&")):
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return put(p.get("target_field", p["field"]), c)
    if kind == "urldecode":
        return put(p.get("target_field", p["field"]),
                   F.url_decode(F.col(p["field"])))
    if kind == "uri_parts":
        src = F.col(p["field"])
        parts = F.struct(
            F.parse_url(src, F.lit("PROTOCOL")).alias("scheme"),
            F.parse_url(src, F.lit("HOST")).alias("domain"),
            F.parse_url(src, F.lit("PATH")).alias("path"),
            F.parse_url(src, F.lit("QUERY")).alias("query"),
            F.parse_url(src, F.lit("REF")).alias("fragment"),
            F.parse_url(src, F.lit("USERINFO")).alias("user_info"))
        return put(p.get("target_field", "url"), parts)
    if kind == "fingerprint":
        # hash over "name=value" pairs joined with "|" (deterministic
        # engine convention — ES's exact byte layout is
        # implementation-private), hex digest like the engine's other
        # digest surfaces; method md5/sha1/sha256
        fields = sorted(p["fields"])
        method = p.get("method", "sha1").lower().replace("-", "")
        fns = {"md5": F.md5, "sha1": F.sha1,
               "sha256": lambda c: F.sha2(c, 256)}
        if method not in fns:
            raise ValueError(f"fingerprint: method {method!r} "
                             "(md5/sha1/sha256)")
        payload = F.concat_ws("|", *[
            F.concat_ws("=", F.lit(f_), F.col(f_).cast("string"))
            for f_ in fields])
        return put(p.get("target_field", "fingerprint"),
                   fns[method](payload))
    if kind == "fail":
        # ES fail processor aborts the document's pipeline; the batch
        # analog aborts the JOB when any row trips the condition —
        # evaluated inside a filter so the check cannot be pruned
        msg = p.get("message", "fail processor triggered")
        if cond is None:
            raise ValueError(f"fail: {msg}")
        return df.filter(F.when(F.coalesce(cond, F.lit(False)),
                                F.raise_error(F.lit(f"fail: {msg}")))
                         .otherwise(F.lit(True)))
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
