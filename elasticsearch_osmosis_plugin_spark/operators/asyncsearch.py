"""ES async-search API analog (`POST /_async_search`, `GET/DELETE
/_async_search/<id>`): fire a DSL search without blocking the caller,
poll its status, fetch the finished result, delete the stored answer.

The reference delegates every query to Elasticsearch, where
long-running searches are submitted asynchronously and their results
parked server-side; here the "server" is the SparkSession — the body
compiles through the same `operators.dsl.search` path and executes on
a daemon thread (Spark sessions are thread-safe for concurrent job
submission; on a cluster each async search is just another job in the
scheduler pool), with the hit frame persisted atomically
(tmp + rename) under the store directory so `get` survives the
submitting process.

Status lifecycle mirrors ES: ``is_running=True`` while the job is in
flight, then ``completed`` with row count, or ``failed`` with the
error string (ES's partial-failure reporting collapsed to the terminal
state — partial results are meaningless for an atomic Spark job).
"""
from __future__ import annotations

import json
import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

_META = "meta.json"
_RESULT = "result.parquet"


def _meta_path(store: str, sid: str) -> str:
    return os.path.join(store, sid, _META)


def _write_meta(store: str, sid: str, meta: dict) -> None:
    path = _meta_path(store, sid)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)  # atomic: readers see old or new, never torn


def submit(spark: SparkSession, index_path: str, body: dict,
           store: str) -> str:
    """Submit ``body`` (the JSON search DSL) against ``index_path``;
    returns the async-search id immediately. The result lands under
    ``store/<id>/`` when the job finishes."""
    from elasticsearch_osmosis_plugin_spark.operators.dsl import search

    sid = uuid.uuid4().hex
    os.makedirs(os.path.join(store, sid), exist_ok=True)
    _write_meta(store, sid, {"status": "running", "body": body})

    def run():
        try:
            df = search(spark, index_path, body)
            out = os.path.join(store, sid, _RESULT)
            df.write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            _write_meta(store, sid, {"status": "completed", "body": body,
                                     "n_hits": n})
        except Exception as e:  # noqa: BLE001 — terminal state must record
            _write_meta(store, sid, {"status": "failed", "body": body,
                                     "error": f"{type(e).__name__}: {e}"})

    t = threading.Thread(target=run, daemon=True,
                         name=f"async-search-{sid[:8]}")
    t.start()
    return sid


def status(store: str, sid: str) -> dict:
    """GET /_async_search/<id> status: {status, is_running, ...}."""
    path = _meta_path(store, sid)
    if not os.path.exists(path):
        raise KeyError(f"unknown async search id: {sid}")
    with open(path) as f:
        meta = json.load(f)
    meta["is_running"] = meta["status"] == "running"
    return meta


def get(spark: SparkSession, store: str, sid: str,
        wait_s: float = 30.0, poll_s: float = 0.1) -> DataFrame:
    """Fetch the finished result (blocking up to ``wait_s`` like ES's
    ``wait_for_completion_timeout``). Raises TimeoutError if still
    running, RuntimeError if the search failed."""
    import time

    deadline = time.monotonic() + wait_s
    while True:
        meta = status(store, sid)
        if meta["status"] == "completed":
            return spark.read.parquet(os.path.join(store, sid, _RESULT))
        if meta["status"] == "failed":
            raise RuntimeError(f"async search failed: {meta['error']}")
        if time.monotonic() >= deadline:
            raise TimeoutError(f"async search {sid} still running "
                               f"after {wait_s}s")
        time.sleep(poll_s)


def delete(store: str, sid: str) -> bool:
    """DELETE /_async_search/<id>: drop the stored result; True if it
    existed."""
    import shutil

    path = os.path.join(store, sid)
    if not os.path.exists(path):
        return False
    shutil.rmtree(path)
    return True
