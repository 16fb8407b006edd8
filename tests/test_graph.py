"""Graph explore API: per-hop significant-term vertices + co-occurrence
edges vs a full Python recompute over the same analyzed corpus."""

import math

import pytest

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py
from elasticsearch_osmosis_plugin_spark.operators import graph
from elasticsearch_osmosis_plugin_spark.operators.query import load_meta
from elasticsearch_osmosis_plugin_spark.plans.build import build_index

CFG = EngineConfig(n_segments=8, n_buckets=4, block_size=16)


@pytest.fixture(scope="module")
def gidx(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graphidx") / "index")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


def _toksets(corpus_rows, meta):
    out = {}
    for _, r in corpus_rows.iterrows():
        out[int(r["doc_id"])] = set(tokenize_py(
            r["content"], meta["analyzer"],
            min_len=meta.get("min_token_len", 1),
            max_len=meta.get("max_token_len", 64)))
    return out


def _py_vertices(toksets, sample_ids, seen, size, min_doc_count, n_docs,
                 use_sig=True):
    n_fg = len(sample_ids)
    fg = {}
    for d in sample_ids:
        for t in toksets[d]:
            fg[t] = fg.get(t, 0) + 1
    bg = {}
    for ts in toksets.values():
        for t in ts:
            bg[t] = bg.get(t, 0) + 1
    rows = []
    for t, c in fg.items():
        if c < min_doc_count or t in seen:
            continue
        if use_sig:
            fr, br = c / n_fg, bg[t] / n_docs
            w = (fr - br) * (fr / br)
        else:
            w = float(c)
        rows.append((t, c, w))
    rows.sort(key=lambda x: (-x[2], x[0]))
    return rows[:size]


def test_explore_two_hops_matches_python(spark, corpus_rows, gidx):
    meta = load_meta(gidx)
    toksets = _toksets(corpus_rows, meta)
    n_docs = len(toksets)

    body = {
        "query": {"match": {"content": "public"}},
        "vertices": [{"field": "content", "size": 4, "min_doc_count": 2}],
        "connections": {
            "vertices": [{"field": "content", "size": 4,
                          "min_doc_count": 2}],
        },
        # cap above corpus size -> no sampling, python twin exact
        "controls": {"sample_size": 1000, "use_significance": True},
    }
    verts, edges = graph.explore(spark, gidx, body)
    vrows = verts.collect()
    erows = edges.collect()

    # hop 0: docs containing the analyzed token of "public"
    seed_tok = tokenize_py("public", meta["analyzer"])[0]
    seed = sorted(d for d, ts in toksets.items() if seed_tok in ts)
    want0 = _py_vertices(toksets, seed, set(), 4, 2, n_docs)
    got0 = [(r["term"], r["doc_count"], r["weight"])
            for r in vrows if r["depth"] == 0]
    assert [(t, c) for t, c, _ in want0] == [(t, c) for t, c, _ in got0]
    for (_, _, ww), (_, _, gw) in zip(want0, got0):
        assert math.isclose(ww, gw, rel_tol=1e-9)

    # hop 1: docs containing >=1 hop-0 term; vertices exclude hop-0
    frontier = {t for t, _, _ in want0}
    hop1 = sorted(d for d, ts in toksets.items() if ts & frontier)
    want1 = _py_vertices(toksets, hop1, frontier, 4, 2, n_docs)
    got1 = [(r["term"], r["doc_count"], r["weight"])
            for r in vrows if r["depth"] == 1]
    assert [(t, c) for t, c, _ in want1] == [(t, c) for t, c, _ in got1]

    # edges: frontier x new co-occurrence doc counts over hop-1 docs
    new_terms = {t for t, _, _ in want1}
    want_edges = {}
    for d in hop1:
        for s in toksets[d] & frontier:
            for t2 in toksets[d] & new_terms:
                want_edges[(s, t2)] = want_edges.get((s, t2), 0) + 1
    got_edges = {(r["source"], r["target"]): r["doc_count"] for r in erows}
    assert got_edges == want_edges
    assert all(r["depth"] in (0, 1) for r in vrows)


def test_explore_controls_and_errors(spark, corpus_rows, gidx):
    meta = load_meta(gidx)
    toksets = _toksets(corpus_rows, meta)

    # use_significance=false -> weight is the raw doc_count
    body = {"query": {"match_all": {}},
            "vertices": [{"field": "content", "size": 3,
                          "min_doc_count": 2}],
            "controls": {"use_significance": False, "sample_size": 1000}}
    verts, _ = graph.explore(spark, gidx, body)
    for r in verts.collect():
        assert r["weight"] == float(r["doc_count"])

    # deterministic sampling: sample_size=3 == first 3 doc_ids
    body["controls"] = {"use_significance": False, "sample_size": 3}
    got = [(r["term"], r["doc_count"])
           for r in graph.explore(spark, gidx, body)[0].collect()]
    want = [(t, c) for t, c, _ in _py_vertices(
        toksets, sorted(toksets)[:3], set(), 3, 2, len(toksets),
        use_sig=False)]
    assert got == want

    # include/exclude term lists
    body = {"query": {"match_all": {}},
            "vertices": [{"field": "content", "size": 10,
                          "min_doc_count": 1,
                          "include": ["package", "import"],
                          "exclude": ["import"]}],
            "controls": {"sample_size": 1000}}
    only = graph.explore(spark, gidx, body)[0].collect()
    assert [r["term"] for r in only] == ["package"]

    with pytest.raises(ValueError, match="per field index"):
        graph.explore(spark, gidx, {
            "query": {"match_all": {}},
            "vertices": [{"field": "other", "size": 3}]})
    with pytest.raises(ValueError, match="term LISTS"):
        graph.explore(spark, gidx, {
            "query": {"match_all": {}},
            "vertices": [{"field": "content", "include": "pub.*"}]})
    with pytest.raises(ValueError, match="seed supports"):
        graph.explore(spark, gidx, {
            "query": {"fuzzy": {"content": "x"}},
            "vertices": [{"field": "content"}]})
