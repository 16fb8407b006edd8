"""ES Watcher (alerting): ``PUT _watcher/watch/<id>`` — a stored
search + condition + actions, executed on a schedule.

What runs here natively:

- **watch store**: one JSON file per watch under a registry dir
  (tmp+rename commits, like the template registry) — put/get/delete/
  list, activate/deactivate;
- **input**: ``{"search": {"request": {"indices": [...], "body":
  {...}}}}`` — the body runs through the engine's DSL compiler
  (:func:`dsl.search`) against each index path, hits unioned; or
  ``{"simple": {...}}`` (a literal payload, ES's test input);
- **condition**: ``always`` / ``never`` / ``compare`` on
  ``ctx.payload.hits.total`` (the canonical alerting predicate) with
  ES's six operators eq/not_eq/gt/gte/lt/lte;
- **actions**: ``logging`` (a record in the execution result +
  history) and ``index`` (payload hits written to a parquet target —
  append via :func:`catalog.add_partition`, so repeated firings
  accumulate like ES's index action);
- **ack state machine** (ES's three states, exactly):
  ``awaits_successful_execution`` -> ``ackable`` once the action
  fires, ``acked`` after :func:`ack_watch` (the action is then
  SKIPPED while the condition keeps holding), reset back to
  ``awaits_successful_execution`` when the condition goes false;
- **history**: every execution appends one JSON line to
  ``history.jsonl`` (watch id, trigger time, condition result, action
  statuses) — ES's ``.watcher-history`` index.

Scheduling itself is the caller's loop, as in ES (whose scheduler
polls too): :func:`due_watches` is the pure scheduling function —
feed it the clock and the last-run map, drive it from cron /
Structured Streaming ``foreachBatch`` / the CLI. Execution time is an
explicit parameter everywhere (deterministic tests; no wall-clock
reads inside the library).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_OPS = {
    "eq": lambda a, b: a == b,
    "not_eq": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
}

_INTERVAL_RE = re.compile(r"^(\d+)([smhd])$")
_INTERVAL_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _watch_path(registry: str, watch_id: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", watch_id):
        raise ValueError(f"invalid watch id {watch_id!r}")
    return os.path.join(registry, "watches", f"{watch_id}.json")


def parse_interval(s: str) -> int:
    """``"10s"/"5m"/"1h"/"2d"`` -> seconds (ES schedule interval)."""
    m = _INTERVAL_RE.match(str(s))
    if not m:
        raise ValueError(f"bad schedule interval {s!r}")
    return int(m.group(1)) * _INTERVAL_S[m.group(2)]


def put_watch(registry: str, watch_id: str, body: dict) -> dict:
    """Validate + store a watch; returns {_id, created}. Unknown
    condition kinds / action kinds / compare operators are rejected at
    PUT time (ES validates the watch on write too)."""
    trig = body.get("trigger", {}).get("schedule", {})
    if "interval" in trig:
        parse_interval(trig["interval"])
    (ikind, _), = body.get("input", {"simple": {}}).items()
    if ikind not in ("search", "simple"):
        raise ValueError(f"unsupported input kind {ikind!r}")
    (ckind, cspec), = body.get("condition", {"always": {}}).items()
    if ckind not in ("always", "never", "compare"):
        raise ValueError(f"unsupported condition kind {ckind!r}")
    if ckind == "compare":
        (path, opspec), = cspec.items()
        if path != "ctx.payload.hits.total":
            raise ValueError("compare supports ctx.payload.hits.total "
                             f"here, not {path!r}")
        (op, _), = opspec.items()
        if op not in _OPS:
            raise ValueError(f"unknown compare operator {op!r}")
    for name, act in body.get("actions", {}).items():
        (akind, _), = act.items()
        if akind not in ("logging", "index"):
            raise ValueError(f"action {name!r}: unsupported kind "
                             f"{akind!r}")
    p = _watch_path(registry, watch_id)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    created = not os.path.exists(p)
    doc = {"watch": body, "status": {
        "active": True,
        "actions": {n: {"ack_state": "awaits_successful_execution"}
                    for n in body.get("actions", {})}}}
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, p)
    return {"_id": watch_id, "created": created}


def get_watch(registry: str, watch_id: str) -> dict:
    try:
        with open(_watch_path(registry, watch_id)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(f"no watch {watch_id!r}") from None


def delete_watch(registry: str, watch_id: str) -> bool:
    try:
        os.unlink(_watch_path(registry, watch_id))
        return True
    except FileNotFoundError:
        return False


def list_watches(registry: str) -> list[str]:
    d = os.path.join(registry, "watches")
    if not os.path.isdir(d):
        return []
    return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))


def set_active(registry: str, watch_id: str, active: bool) -> None:
    """ES _activate / _deactivate."""
    doc = get_watch(registry, watch_id)
    doc["status"]["active"] = bool(active)
    _save(registry, watch_id, doc)


def ack_watch(registry: str, watch_id: str,
              action_ids: list[str] | None = None) -> dict:
    """ES _ack: ackable actions -> acked (they stop firing until the
    condition resets them). Acking a never-fired action is a no-op,
    as in ES."""
    doc = get_watch(registry, watch_id)
    acts = doc["status"]["actions"]
    for n in (action_ids or list(acts)):
        if acts[n]["ack_state"] == "ackable":
            acts[n]["ack_state"] = "acked"
    _save(registry, watch_id, doc)
    return {n: a["ack_state"] for n, a in acts.items()}


def _save(registry: str, watch_id: str, doc: dict) -> None:
    p = _watch_path(registry, watch_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, p)


def due_watches(registry: str, now_s: float,
                last_runs: dict[str, float]) -> list[str]:
    """Pure scheduler step: active watches whose interval has elapsed
    since their last run (never-run watches are always due)."""
    due = []
    for wid in list_watches(registry):
        doc = get_watch(registry, wid)
        if not doc["status"]["active"]:
            continue
        iv = parse_interval(
            doc["watch"].get("trigger", {}).get("schedule", {})
            .get("interval", "1m"))
        if now_s - last_runs.get(wid, float("-inf")) >= iv:
            due.append(wid)
    return due


def _run_input(spark: SparkSession, body: dict) -> tuple[int, DataFrame | None]:
    """Returns (hits.total, hits DataFrame or None for simple input)."""
    from elasticsearch_osmosis_plugin_spark.operators import dsl

    (ikind, ispec), = body.get("input", {"simple": {}}).items()
    if ikind == "simple":
        return int(ispec.get("hits", {}).get("total", 0)), None
    req = ispec["request"]
    hits = None
    for path in req["indices"]:
        h = dsl.search(spark, path, req.get("body", {}))
        hits = h if hits is None else hits.unionByName(
            h, allowMissingColumns=True)
    total = hits.count() if hits is not None else 0
    return total, hits


def execute_watch(spark: SparkSession, registry: str, watch_id: str,
                  trigger_time: str, *,
                  ignore_condition: bool = False,
                  record: bool = True) -> dict:
    """One watch execution (ES ``_execute`` and what the scheduler
    calls): run the input, evaluate the condition, fire un-acked
    actions, update ack states, append the history line.

    ``trigger_time`` is caller-supplied (ISO string) — the library
    never reads the wall clock."""
    doc = get_watch(registry, watch_id)
    if not doc["status"]["active"] and not ignore_condition:
        return {"_id": watch_id, "state": "inactive", "actions": {}}
    w = doc["watch"]
    total, hits = _run_input(spark, w)

    (ckind, cspec), = w.get("condition", {"always": {}}).items()
    if ignore_condition:
        met = True
    elif ckind == "always":
        met = True
    elif ckind == "never":
        met = False
    else:
        (_, opspec), = cspec.items()
        (op, rhs), = opspec.items()
        met = _OPS[op](total, rhs)

    results: dict[str, Any] = {}
    acts = doc["status"]["actions"]
    for name, act in w.get("actions", {}).items():
        st = acts.setdefault(
            name, {"ack_state": "awaits_successful_execution"})
        if not met:
            # ES: a false condition resets acked actions to awaiting
            if st["ack_state"] == "acked":
                st["ack_state"] = "awaits_successful_execution"
            results[name] = {"status": "condition_not_met"}
            continue
        if st["ack_state"] == "acked":
            results[name] = {"status": "throttled", "reason": "acked"}
            continue
        (akind, aspec), = act.items()
        if akind == "logging":
            results[name] = {"status": "success", "logging":
                             str(aspec.get("text", "")).replace(
                                 "{{ctx.payload.hits.total}}",
                                 str(total))}
        else:  # index action: append payload hits to the target table
            import shutil
            import uuid

            if hits is None:
                raise ValueError("index action needs a search input")
            tgt = aspec["index"]
            os.makedirs(tgt, exist_ok=True)
            safe = re.sub(r"[^A-Za-z0-9_.-]", "_", trigger_time)
            dst = os.path.join(tgt, f"fire={safe}")
            tmp = f"{tgt}.tmp.{uuid.uuid4().hex[:8]}"
            hits.write.mode("overwrite").parquet(tmp)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.rename(tmp, dst)  # one-rename commit per firing
            results[name] = {"status": "success", "index": tgt,
                             "docs": total}
        st["ack_state"] = "ackable"
    _save(registry, watch_id, doc)

    rec = {"watch_id": watch_id, "trigger_time": trigger_time,
           "hits_total": total, "condition_met": met,
           "actions": results}
    if record:
        with open(os.path.join(registry, "history.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    return rec
