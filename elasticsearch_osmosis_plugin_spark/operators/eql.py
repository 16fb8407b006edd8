"""Event-sequence queries (ES EQL analog) over an event table.

Elasticsearch ships EQL (`/_eql/search`) for ordered event-sequence
matching: ``sequence by user [view] [click] [error] with maxspan=6h``.
The reference plugin streams entities into ES where such queries run
engine-side; here the sequence engine is native Spark.

Two operators:

- :func:`sequence` — every minimal chain (``overlap="all"``, pure
  DataFrame windows + co-partitioned self-joins; SQL-expressible so it
  sits under the hard DuckDB gate) or greedy non-overlapping matches
  (``overlap="skip"``, Arrow-batched per-key kernel; pytest-verified
  against an independent brute-force oracle).
- :func:`funnel` — classic funnel analysis: per key, the earliest
  chain starting at the key's FIRST occurrence of step 0, with
  per-step timestamps and a steps-reached count (partial progress kept,
  unlike ``sequence`` which only emits completed chains).

Scale notes (100 TB): the only shuffle is one hash partition by the
sequence key (the window and every chain join reuse that partitioning —
co-partitioned sort-merge joins, no second exchange). State per key is
O(1) columns, not collected arrays, so hot keys stress the sort, not
executor memory; the ``skip`` kernel streams each key group through
Arrow batches and holds only per-type cursors.
"""
from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _span_us(hi: str, lo: str):
    """Microsecond span between two timestamp columns (NTZ-safe: the
    cast to session-tz timestamp shifts both ends identically)."""
    return (F.unix_micros(F.col(hi).cast("timestamp"))
            - F.unix_micros(F.col(lo).cast("timestamp"))).cast("double")


def _next_struct_cols(df: DataFrame, steps: Sequence[str], by: str,
                      ts_col: str, tie_col: str, type_col: str,
                      until: str | None = None):
    """Enrich every event with, for each non-initial step i, the
    lexicographically-earliest (ts, tie) of a step-i event strictly
    AFTER this row in (ts, tie) order within the same key.

    "After" is row order under ORDER BY (ts, tie) — a deterministic
    total order even under timestamp ties — implemented as one window
    pass (rowsBetween(1, unboundedFollowing)) computing all k-1
    pointers together."""
    w = (Window.partitionBy(by).orderBy(ts_col, tie_col)
         .rowsBetween(1, Window.unboundedFollowing))
    out = df
    for i, step in enumerate(steps):
        if i == 0:
            continue
        out = out.withColumn(
            f"_nxt{i}",
            F.min(F.when(F.col(type_col) == step,
                         F.struct(F.col(ts_col).alias("ts"),
                                  F.col(tie_col).alias("tie")))).over(w))
    if until is not None:
        out = out.withColumn(
            "_nxtu",
            F.min(F.when(F.col(type_col) == until,
                         F.struct(F.col(ts_col).alias("ts"),
                                  F.col(tie_col).alias("tie")))).over(w))
    return out


def sequence(events: DataFrame, steps: Sequence[str], *,
             by: str = "user_id", ts_col: str = "ts",
             tie_col: str = "event_id", type_col: str = "event_type",
             maxspan_s: float | None = None,
             until: str | None = None,
             overlap: str = "all") -> DataFrame:
    """EQL ``sequence by <key> [step0] [step1] ... with maxspan`` over
    an event DataFrame.

    ``overlap="all"`` (default): emit every MINIMAL chain — for each
    step-0 event, the earliest following step-1 event, then the
    earliest step-2 event after that, and so on (each link minimal in
    (ts, tie) order); the chain matches when ``t_last - t_0 <=
    maxspan_s``. This is EQL's skip-to-next-row reading: chains may
    share non-initial events.

    ``overlap="skip"``: greedy non-overlapping (leftmost-earliest)
    matching — repeatedly emit the earliest-starting chain whose
    events all lie strictly after the previously emitted match's last
    event; chains never share ANY event. Runs as an Arrow-batched
    per-key kernel (inherently stateful — not SQL-expressible).

    ``until`` (EQL ``sequence ... until [x]``): an until-type event
    KILLS any in-flight sequence — a chain survives only when no until
    event lies strictly between its first and last consumed events in
    (ts, tie) order.

    Returns one row per match: (key, t1..tk timestamps, id1..idk tie
    values), ordered by (key, t1, id1).
    """
    k = len(steps)
    if k < 2:
        raise ValueError("sequence needs >=2 steps")
    if overlap not in ("all", "skip"):
        raise ValueError(f"unknown overlap mode {overlap!r}")
    if until is not None and until in steps:
        raise ValueError("until type must not be one of the steps")
    types = list(steps) + ([until] if until is not None else [])
    ev = (events.select(by, ts_col, tie_col, type_col)
          .filter(F.col(type_col).isin(types)))

    if overlap == "skip":
        return _sequence_skip(ev, steps, by=by, ts_col=ts_col,
                              tie_col=tie_col, type_col=type_col,
                              maxspan_s=maxspan_s, until=until)

    enriched = _next_struct_cols(ev, steps, by, ts_col, tie_col, type_col,
                                 until=until)
    base_cols = [F.col(by),
                 F.col(ts_col).alias("t1"),
                 F.col(tie_col).alias("id1"),
                 F.col("_nxt1")]
    if until is not None:
        base_cols.append(F.col("_nxtu"))
    base = (enriched.filter(F.col(type_col) == steps[0])
            .select(base_cols))
    for i in range(1, k):
        right_cols = [F.col(by).alias("_rby"),
                      F.struct(F.col(ts_col).alias("ts"),
                               F.col(tie_col).alias("tie")).alias("_self"),
                      F.col(ts_col).alias(f"t{i + 1}"),
                      F.col(tie_col).alias(f"id{i + 1}")]
        if i + 1 < k:
            right_cols.append(F.col(f"_nxt{i + 1}"))
        right = enriched.filter(F.col(type_col) == steps[i]).select(right_cols)
        base = (base.join(right, (F.col(by) == F.col("_rby"))
                          & (F.col(f"_nxt{i}") == F.col("_self")))
                .drop("_rby", "_self", f"_nxt{i}"))
    if maxspan_s is not None:
        base = base.filter(_span_us(f"t{k}", "t1")
                           <= float(maxspan_s) * 1e6)
    if until is not None:
        last = F.struct(F.col(f"t{k}").alias("ts"),
                        F.col(f"id{k}").alias("tie"))
        base = base.filter(F.col("_nxtu").isNull()
                           | (F.col("_nxtu") > last))
    cols = [by] + [c for i in range(1, k + 1)
                   for c in (f"t{i}", f"id{i}")]
    return base.select(*cols).orderBy(by, "t1", "id1")


def _sequence_skip(ev: DataFrame, steps: Sequence[str], *, by: str,
                   ts_col: str, tie_col: str, type_col: str,
                   maxspan_s: float | None,
                   until: str | None = None) -> DataFrame:
    """Greedy non-overlapping matcher: per key, repeatedly find the
    earliest-completing minimal chain whose events all follow the
    previous match's last consumed event, emit it, and continue after
    its last event. Deterministic under the (ts, tie) total order."""
    import bisect

    k = len(steps)
    fields = ", ".join(
        [f"`{by}` long"]
        + [f"t{i} timestamp_ntz, id{i} long" for i in range(1, k + 1)])
    out_schema = fields

    cols = [by] + [c for i in range(1, k + 1) for c in (f"t{i}", f"id{i}")]

    def matcher(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values([ts_col, tie_col])
        key = pdf[by].iloc[0]
        # per-type sorted (ts, tie) event lists
        per: dict[str, list] = {s: [] for s in steps}
        untils: list = []
        for t, tie, ty in zip(pdf[ts_col], pdf[tie_col], pdf[type_col]):
            if ty == until:
                untils.append((t, tie))
            else:
                per[ty].append((t, tie))
        rows = []
        cursor = None  # last consumed (ts, tie)
        starts, si = per[steps[0]], 0
        while si < len(starts):
            first = starts[si]
            if cursor is not None and first <= cursor:
                si += 1
                continue
            chain, prev, ok = [first], first, True
            for step in steps[1:]:
                lst = per[step]
                j = bisect.bisect_right(lst, prev)
                if j >= len(lst):
                    ok = False
                    break
                prev = lst[j]
                chain.append(prev)
            if ok and untils:
                # until kills in-flight sequences: any until event
                # strictly between first and last consumed invalidates
                j = bisect.bisect_right(untils, chain[0])
                if j < len(untils) and untils[j] < chain[-1]:
                    ok = False
            if ok and (maxspan_s is None
                       or (chain[-1][0] - chain[0][0]).total_seconds()
                       <= maxspan_s):
                row = [key]
                for t, tie in chain:
                    row += [t, tie]
                rows.append(row)
                cursor = chain[-1]
            si += 1
        return pd.DataFrame(rows, columns=cols)

    out = (ev.repartition(F.col(by)).groupBy(by)
           .applyInPandas(matcher, out_schema))
    return out.orderBy(by, "t1", "id1")


_MAXSPAN_UNITS = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def eql_search(events: DataFrame, query: str, *,
               by_default: str = "user_id", ts_col: str = "ts",
               tie_col: str = "event_id", type_col: str = "event_type",
               overlap: str = "all") -> DataFrame:
    """Text front end for the EQL subset this engine executes
    (ES POST /_eql/search ``query`` strings):

        sequence by <field> [with maxspan=<n><s|m|h|d>]
            [<type>] [<type>] ... [until [<type>]]
        sample by <field> [<type>] [<type>] ...

    A step is ``[<type>]`` or the explicit ES form
    ``[ any where event_type == "<type>" ]``. Anything outside the
    subset raises ValueError (no silent approximation). The parse
    produces exactly a :func:`sequence` / :func:`sample` call."""
    import re

    q = query.strip()
    m = re.match(r"^(sequence|sample)\s+by\s+([A-Za-z_][\w.]*)"
                 r"(?:\s+with\s+maxspan\s*=\s*(\d+)([smhd]))?\s*(.*)$",
                 q, re.DOTALL)
    if not m:
        raise ValueError(f"unsupported EQL query: {query!r}")
    kind, by, span_n, span_u, rest = m.groups()
    maxspan_s = (float(span_n) * _MAXSPAN_UNITS[span_u]
                 if span_n is not None else None)

    until = None
    um = re.search(r"\buntil\s+(\[[^\]]*\])\s*$", rest)
    if um:
        until = _parse_step(um.group(1), type_col)
        rest = rest[:um.start()]
    # ``[x] with runs=N`` (ES 8.4 repetition sugar): the step must
    # match N consecutive times — expanded inline, so the sequence
    # kernel needs no new state shape
    steps = []
    for body, runs in re.findall(
            r"\[([^\]]*)\](?:\s+with\s+runs\s*=\s*(\d+))?", rest):
        n = int(runs) if runs else 1
        if not 1 <= n <= 100:
            raise ValueError(f"EQL runs must be in [1, 100]: {runs}")
        steps += [_parse_step(f"[{body}]", type_col)] * n
    if re.sub(r"\[[^\]]*\](\s+with\s+runs\s*=\s*\d+)?|\s", "", rest):
        raise ValueError(f"unparsed EQL tail in: {rest!r}")
    if not steps:
        raise ValueError("EQL query needs at least one [step]")

    if kind == "sample":
        if maxspan_s is not None or until is not None:
            raise ValueError("sample takes no maxspan/until")
        return sample(events, steps, by=by, ts_col=ts_col,
                      tie_col=tie_col, type_col=type_col)
    return sequence(events, steps, by=by, ts_col=ts_col, tie_col=tie_col,
                    type_col=type_col, maxspan_s=maxspan_s, until=until,
                    overlap=overlap)


def _parse_step(step: str, type_col: str) -> str:
    """``[x]`` or ``[any where <type_col> == "x"]`` -> the event type."""
    import re

    body = step.strip()[1:-1].strip()
    m = re.match(rf'^any\s+where\s+{re.escape(type_col)}\s*==\s*'
                 r'"([^"]+)"$', body)
    if m:
        return m.group(1)
    if re.match(r"^[\w.-]+$", body):
        return body
    raise ValueError(f"unsupported EQL step filter: {step!r}")


def sample(events: DataFrame, steps: Sequence[str], *,
           by: str = "user_id", ts_col: str = "ts",
           tie_col: str = "event_id",
           type_col: str = "event_type") -> DataFrame:
    """EQL ``sample by <key> [s0] [s1] ...``: per join key, ONE matching
    event per step, with NO time-ordering constraint between steps —
    EQL's sample form for correlating unordered facts about a key. ES
    returns an arbitrary sample; this engine picks the deterministic
    one (the (ts, tie)-earliest event of each step type), so results
    are reproducible and SQL-twin-able.

    Plan: one conditional-min groupBy over the key — a single shuffle,
    no joins, no per-key arrays. Keys missing any step are dropped
    (inner semantics, like EQL). Output: (key, t1, id1, ..., tk, idk)
    ordered by key."""
    k = len(steps)
    if k < 1:
        raise ValueError("sample needs >=1 step")
    ev = (events.select(by, ts_col, tie_col, type_col)
          .filter(F.col(type_col).isin(list(steps))))
    s = F.struct(F.col(ts_col).alias("ts"), F.col(tie_col).alias("tie"))
    aggs = [F.min(F.when(F.col(type_col) == step, s)).alias(f"_c{i + 1}")
            for i, step in enumerate(steps)]
    out = ev.groupBy(by).agg(*aggs)
    for i in range(1, k + 1):
        out = out.filter(F.col(f"_c{i}").isNotNull())
    sel = [F.col(by)]
    for i in range(1, k + 1):
        sel += [F.col(f"_c{i}.ts").alias(f"t{i}"),
                F.col(f"_c{i}.tie").alias(f"id{i}")]
    return out.select(*sel).orderBy(by)


def funnel(events: DataFrame, steps: Sequence[str], *,
           by: str = "user_id", ts_col: str = "ts",
           tie_col: str = "event_id", type_col: str = "event_type",
           maxspan_s: float | None = None) -> DataFrame:
    """Funnel analysis: per key, the earliest chain rooted at the
    key's FIRST step-0 event — t1 = min (ts, tie) of step 0, t_{i+1} =
    earliest step-(i+1) event strictly after t_i — keeping partial
    progress (nulls past the first missing step) plus ``steps_reached``
    and ``converted`` (all steps present within ``maxspan_s``).

    Plan: k passes of groupBy(key) conditional min + one co-partitioned
    join back per pass; every pass shuffles on the same key so AQE
    reuses the exchange. No per-key arrays are materialized — hot keys
    cost sort time, not memory. One row per key that has a step-0
    event, ordered by key."""
    k = len(steps)
    if k < 1:
        raise ValueError("funnel needs >=1 step")
    ev = (events.select(by, ts_col, tie_col, type_col)
          .filter(F.col(type_col).isin(list(steps))))
    evs = ev.withColumn("_s", F.struct(F.col(ts_col).alias("ts"),
                                       F.col(tie_col).alias("tie")))
    acc = (evs.filter(F.col(type_col) == steps[0])
           .groupBy(by).agg(F.min("_s").alias("_c1")))
    for i in range(1, k):
        nxt = (evs.filter(F.col(type_col) == steps[i])
               .join(acc.select(by, f"_c{i}"), by)
               .filter(F.col(f"_c{i}").isNotNull()
                       & (F.col("_s") > F.col(f"_c{i}")))
               .groupBy(by).agg(F.min("_s").alias(f"_c{i + 1}")))
        acc = acc.join(nxt, by, "left")
    sel = [F.col(by)]
    for i in range(1, k + 1):
        sel += [F.col(f"_c{i}.ts").alias(f"t{i}"),
                F.col(f"_c{i}.tie").alias(f"id{i}")]
    out = acc.select(*sel)
    reached = sum(
        (F.col(f"t{i}").isNotNull().cast("int") for i in range(1, k + 1)),
        F.lit(0))
    out = out.withColumn("steps_reached", reached.cast("long"))
    conv = F.col(f"t{k}").isNotNull()
    if maxspan_s is not None:
        conv = conv & (_span_us(f"t{k}", "t1") <= float(maxspan_s) * 1e6)
    return out.withColumn("converted", conv).orderBy(by)
