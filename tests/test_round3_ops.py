"""Round-3 additions: span_multi, percentiles_bucket, fuzzy
completion suggester — each vs an independent Python oracle."""
from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators import dsl, intersect
from elasticsearch_osmosis_plugin_spark.plans.build import build_index

CFG = EngineConfig(n_segments=8, n_buckets=4, block_size=16)


@pytest.fixture(scope="module")
def idx(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r3idx") / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_span_multi_near_equals_expanded_span_or(spark, idx):
    """span_multi(prefix) under span_near == span_or_near over the
    hand-expanded dictionary terms."""
    exp = intersect.expand_terms(spark, idx, "pub", mode="prefix")
    assert exp  # corpus has 'public'
    body = {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"content": {"value": "pub"}}}}},
        {"span_term": {"content": "static"}}],
        "slop": 1, "in_order": True}}, "size": 500}
    got = _ids(dsl.search(spark, idx, body))
    want = _ids(intersect.span_or_near(spark, idx, [exp, ["static"]],
                                       slop=1, in_order=True))
    assert got == want and got


def test_span_multi_standalone_matches_expansion_docs(spark, idx):
    body = {"query": {"span_multi": {"match": {
        "wildcard": {"content": {"value": "stat*"}}}}}, "size": 500}
    got = _ids(dsl.search(spark, idx, body))
    want = _ids(intersect.match_expanded(spark, idx, "stat.*", mode="regex"))
    assert got == want and got


def test_span_multi_fuzzy_clause(spark, idx):
    """fuzzy 'statik'~1 expands to 'static'; span_near behaves as the
    plain two-term span_near."""
    body = {"query": {"span_near": {"clauses": [
        {"span_term": {"content": "public"}},
        {"span_multi": {"match": {"fuzzy": {"content": {
            "value": "statics", "fuzziness": 1}}}}}],
        "slop": 1, "in_order": True}}, "size": 500}
    got = _ids(dsl.search(spark, idx, body))
    want = _ids(intersect.span_near(spark, idx, "public static",
                                    slop=1, in_order=True))
    assert got == want and got


def test_span_multi_no_expansion_is_empty(spark, idx):
    body = {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"content":
                                             {"value": "zzzzq"}}}}},
        {"span_term": {"content": "static"}}], "slop": 0}}, "size": 10}
    assert dsl.search(spark, idx, body).count() == 0


def test_span_multi_rejects_unknown_wrapped(spark, idx):
    with pytest.raises(ValueError):
        dsl.search(spark, idx, {"query": {"span_multi": {"match": {
            "range": {"content": {"gte": 1}}}}}})


def test_percentiles_bucket_exact(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    buckets = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                    "bucket int, n_docs double")
    got = {r["pct"]: r["value"] for r in intersect.percentiles_bucket(
        buckets, percentiles=(0.25, 0.5, 0.75, 1.0)).collect()}
    for p in (0.25, 0.5, 0.75, 1.0):
        want = float(np.quantile(np.array(vals), p))  # linear interp
        assert got[p] == pytest.approx(want, abs=1e-12)


def test_percentiles_bucket_validates(spark):
    b = spark.createDataFrame([(1, 1.0)], "bucket int, n_docs double")
    with pytest.raises(ValueError):
        intersect.percentiles_bucket(b, percentiles=(1.5,))


def test_async_search_lifecycle(spark, idx, tmp_path):
    """submit -> running/completed status -> get == synchronous search
    -> delete; a failing body lands in status=failed with the error."""
    from elasticsearch_osmosis_plugin_spark.operators import asyncsearch

    store = str(tmp_path / "async_store")
    body = {"query": {"match": {"content": "public static"}}, "size": 5}
    sid = asyncsearch.submit(spark, idx, body, store)
    got = asyncsearch.get(spark, store, sid, wait_s=120)
    want = dsl.search(spark, idx, body)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert asyncsearch.status(store, sid)["status"] == "completed"
    assert asyncsearch.status(store, sid)["n_hits"] == got.count()

    bad = asyncsearch.submit(spark, idx, {"query": {"nope": {}}}, store)
    with pytest.raises(RuntimeError, match="nope|unsupported|unknown"):
        asyncsearch.get(spark, store, bad, wait_s=120)
    assert asyncsearch.status(store, bad)["status"] == "failed"

    assert asyncsearch.delete(store, sid)
    assert not asyncsearch.delete(store, sid)
    with pytest.raises(KeyError):
        asyncsearch.status(store, sid)


def test_suggest_completion_fuzzy(spark, idx):
    """Exact-prefix hits rank before distance-1 hits regardless of
    popularity; results reproduce a dictionary-side Python oracle."""
    from elasticsearch_osmosis_plugin_spark.plans.build import dictionary_df

    prefix, fuzz, size = "sta", 1, 10
    got = [(r["term"], r["distance"]) for r in
           intersect.suggest_completion_fuzzy(
               spark, idx, prefix, fuzziness=fuzz, size=size).collect()]

    rows = (dictionary_df(spark, idx).groupBy("term")
            .agg(intersect.F.sum("cf").alias("cf")).collect())

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cand = sorted(
        ((lev(t[:len(prefix)], prefix), -c, t)
         for t, c in ((r["term"], r["cf"]) for r in rows)
         if lev(t[:len(prefix)], prefix) <= fuzz))[:size]
    assert got == [(t, d) for d, _negcf, t in cand]
    assert got and got[0][1] == 0  # 'static' itself is an exact prefix
