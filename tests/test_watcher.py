"""ES Watcher: stored search + condition + actions, ack state machine,
pure scheduler step, history — all with caller-supplied clocks."""

import json
import os

import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators import watcher as w
from elasticsearch_osmosis_plugin_spark.plans.build import build_index

CFG = EngineConfig(n_segments=4, n_buckets=4, block_size=16)


@pytest.fixture(scope="module")
def widx(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("watchidx") / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


def _watch_body(widx, sink=None, condition=None):
    acts = {"log_it": {"logging": {
        "text": "hits={{ctx.payload.hits.total}}"}}}
    if sink:
        acts["store_it"] = {"index": {"index": sink}}
    return {
        "trigger": {"schedule": {"interval": "5m"}},
        "input": {"search": {"request": {
            "indices": [widx],
            "body": {"query": {"match": {"content": "public static"}},
                     "size": 100}}}},
        "condition": condition or {
            "compare": {"ctx.payload.hits.total": {"gte": 1}}},
        "actions": acts,
    }


def test_watch_crud_and_validation(tmp_path, widx):
    reg = str(tmp_path)
    assert w.put_watch(reg, "w1", _watch_body(widx))["created"]
    assert not w.put_watch(reg, "w1", _watch_body(widx))["created"]
    assert w.list_watches(reg) == ["w1"]
    assert w.get_watch(reg, "w1")["status"]["active"]
    with pytest.raises(ValueError, match="condition kind"):
        w.put_watch(reg, "w2", {"condition": {"script": {}}})
    with pytest.raises(ValueError, match="compare operator"):
        w.put_watch(reg, "w2", {"condition": {"compare": {
            "ctx.payload.hits.total": {"between": 3}}}})
    with pytest.raises(ValueError, match="ctx.payload.hits.total"):
        w.put_watch(reg, "w2", {"condition": {"compare": {
            "ctx.payload.foo": {"gte": 3}}}})
    with pytest.raises(ValueError, match="interval"):
        w.put_watch(reg, "w2", {"trigger": {"schedule":
                                            {"interval": "5x"}}})
    assert w.delete_watch(reg, "w1") and not w.delete_watch(reg, "w1")


def test_execute_fire_ack_reset(spark, tmp_path, widx):
    reg = str(tmp_path)
    sink = str(tmp_path / "alerts")
    w.put_watch(reg, "alert", _watch_body(widx, sink=sink))

    r1 = w.execute_watch(spark, reg, "alert", "2026-01-01T00:00:00")
    assert r1["condition_met"] and r1["hits_total"] > 0
    assert r1["actions"]["log_it"]["status"] == "success"
    assert r1["actions"]["log_it"]["logging"] == \
        f"hits={r1['hits_total']}"
    assert r1["actions"]["store_it"]["status"] == "success"
    stored = spark.read.parquet(sink)
    assert stored.count() == r1["hits_total"]
    assert "fire" in stored.columns  # partitioned by firing time

    # fired -> ackable -> acked: action throttles while condition holds
    st = w.ack_watch(reg, "alert", ["store_it"])
    assert st["store_it"] == "acked" and st["log_it"] == "ackable"
    r2 = w.execute_watch(spark, reg, "alert", "2026-01-01T00:05:00")
    assert r2["actions"]["store_it"]["status"] == "throttled"
    assert r2["actions"]["log_it"]["status"] == "success"

    # condition goes false -> acked resets to awaits_successful_execution
    doc = w.get_watch(reg, "alert")
    doc["watch"]["condition"] = {
        "compare": {"ctx.payload.hits.total": {"gt": 10 ** 9}}}
    w._save(reg, "alert", doc)
    r3 = w.execute_watch(spark, reg, "alert", "2026-01-01T00:10:00")
    assert not r3["condition_met"]
    assert r3["actions"]["store_it"]["status"] == "condition_not_met"
    assert w.get_watch(reg, "alert")["status"]["actions"]["store_it"][
        "ack_state"] == "awaits_successful_execution"

    # history carries one line per execution
    with open(os.path.join(reg, "history.jsonl")) as f:
        hist = [json.loads(x) for x in f]
    assert [h["trigger_time"] for h in hist] == [
        "2026-01-01T00:00:00", "2026-01-01T00:05:00",
        "2026-01-01T00:10:00"]

    # inactive watches don't execute
    w.set_active(reg, "alert", False)
    assert w.execute_watch(spark, reg, "alert",
                           "2026-01-01T00:15:00")["state"] == "inactive"


def test_due_watches_pure_scheduler(tmp_path, widx):
    reg = str(tmp_path)
    w.put_watch(reg, "fast", _watch_body(widx))   # 5m interval
    body = _watch_body(widx)
    body["trigger"] = {"schedule": {"interval": "1h"}}
    w.put_watch(reg, "slow", body)
    w.put_watch(reg, "off", _watch_body(widx))
    w.set_active(reg, "off", False)

    assert w.due_watches(reg, 0.0, {}) == ["fast", "slow"]
    last = {"fast": 0.0, "slow": 0.0}
    assert w.due_watches(reg, 299.0, last) == []
    assert w.due_watches(reg, 300.0, last) == ["fast"]
    assert w.due_watches(reg, 3600.0, last) == ["fast", "slow"]
    assert w.parse_interval("2d") == 172800


def test_simple_input_and_never(spark, tmp_path):
    reg = str(tmp_path)
    w.put_watch(reg, "s", {
        "input": {"simple": {"hits": {"total": 7}}},
        "condition": {"compare": {"ctx.payload.hits.total": {"eq": 7}}},
        "actions": {"l": {"logging": {"text": "t"}}}})
    r = w.execute_watch(spark, reg, "s", "2026-01-01T00:00:00")
    assert r["condition_met"] and r["hits_total"] == 7
    w.put_watch(reg, "n", {"input": {"simple": {}},
                           "condition": {"never": {}},
                           "actions": {"l": {"logging": {"text": "t"}}}})
    r = w.execute_watch(spark, reg, "n", "2026-01-01T00:00:00")
    assert not r["condition_met"]
