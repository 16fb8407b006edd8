"""CLI surface: python -m elasticsearch_osmosis_plugin_spark ...
(the spark-submit deployment shape the north rule names). In-process
main() calls reuse the test session; one subprocess test runs the real
``spark-submit --py-files eosp.zip`` path end-to-end."""

import json
import os
import subprocess
import sys

import pytest

from elasticsearch_osmosis_plugin_spark.__main__ import main

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "index")
    rc = main(["build", "--input", f"{SF}/documents.parquet",
               "--index", path, "--id-col", "doc_id", "--text-col", "text",
               "--analyzer", "simple", "--n-segments", "4",
               "--n-buckets", "4", "--n-groups", "1",
               "--shuffle-partitions", "4"])
    assert rc == 0
    return path


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines() if line]


def test_cli_query_matches_library(spark, cli_index, capsys):
    from elasticsearch_osmosis_plugin_spark.operators.query import topk

    rows = _run(capsys, ["query", "--index", cli_index,
                         "--query", "spark query join", "--k", "5",
                         "--shuffle-partitions", "4"])
    want = topk(spark, cli_index, "spark query join", k=5).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in want]
    assert len(rows) == 5


def test_cli_phrase_count_stats_delete(spark, cli_index, capsys):
    rows = _run(capsys, ["phrase", "--index", cli_index,
                         "--phrase", "query join",
                         "--shuffle-partitions", "4"])
    assert rows and all("doc_id" in r for r in rows)
    slop = _run(capsys, ["phrase", "--index", cli_index,
                         "--phrase", "query join", "--slop", "3",
                         "--shuffle-partitions", "4"])
    assert {r["doc_id"] for r in slop} >= {r["doc_id"] for r in rows}
    (cnt,) = _run(capsys, ["count", "--index", cli_index,
                           "--query", "spark", "--shuffle-partitions", "4"])
    assert cnt["count"] > 0
    (st,) = _run(capsys, ["stats", "--index", cli_index,
                          "--shuffle-partitions", "4"])
    assert st["n_docs"] == 500 and st["n_terms"] > 0
    victim = rows[0]["doc_id"]
    (dl,) = _run(capsys, ["delete", "--index", cli_index,
                          "--ids", str(victim), "--shuffle-partitions", "4"])
    assert dl["tombstoned"] == 1
    after = _run(capsys, ["phrase", "--index", cli_index,
                          "--phrase", "query join",
                          "--shuffle-partitions", "4"])
    assert victim not in {r["doc_id"] for r in after}


def test_cli_package_and_spark_submit(tmp_path, capsys):
    """The real deployment path: zip the library, spark-submit a driver
    script with --py-files, run build + query inside the submitted JVM."""
    zpath = str(tmp_path / "eosp.zip")
    rc = main(["package", "--out", zpath])
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(zpath)

    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        f"sys.path.insert(0, {zpath!r})\n"
        "from elasticsearch_osmosis_plugin_spark.__main__ import main\n"
        f"idx = {str(tmp_path / 'idx')!r}\n"
        f"main(['build', '--input', '{SF}/documents.parquet',\n"
        "      '--index', idx, '--id-col', 'doc_id', '--text-col', 'text',\n"
        "      '--analyzer', 'simple', '--n-segments', '2',\n"
        "      '--n-buckets', '2', '--n-groups', '1',\n"
        "      '--shuffle-partitions', '2'])\n"
        "main(['query', '--index', idx, '--query', 'spark query join',\n"
        "      '--k', '3', '--shuffle-partitions', '2'])\n")
    spark_submit = os.path.join(os.environ.get("SPARK_HOME", ""),
                                "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit binary not found")
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    out = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zpath,
         str(driver)],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines[0]["n_docs"] == 500
    assert len(lines) == 4 and all("doc_id" in r for r in lines[1:])


def test_cli_search_alias_snapshot(spark, cli_index, capsys, tmp_path):
    """New admin/query surfaces: DSL search body, alias swap,
    snapshot/restore — all through the CLI."""
    body = json.dumps({"query": {"match": {"text": "spark query join"}},
                       "size": 5})
    rows = _run(capsys, ["search", "--index", cli_index, "--body", body])
    from elasticsearch_osmosis_plugin_spark.operators.query import topk

    want = topk(spark, cli_index, "spark query join", k=5).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in want]

    alias = str(tmp_path / "current")
    out = _run(capsys, ["alias", "--alias", alias, "--index", cli_index])
    assert out[0]["index"] == os.path.realpath(cli_index)
    rows2 = _run(capsys, ["search", "--index", alias, "--body", body])
    assert rows2 == rows
    assert _run(capsys, ["alias", "--alias", alias, "--drop"])[0]["dropped"]

    snap = str(tmp_path / "snap")
    out = _run(capsys, ["snapshot", "--index", cli_index, "--to", snap])
    assert out[0]["n_docs"] > 0
    _run(capsys, ["restore", "--snapshot", snap, "--index", cli_index])
    rows3 = _run(capsys, ["search", "--index", cli_index, "--body", body])
    assert rows3 == rows


def test_cli_fsck(spark, cli_index, capsys):
    out = _run(capsys, ["fsck", "--index", cli_index,
                        "--source", f"{SF}/documents.parquet",
                        "--id-col", "doc_id", "--text-col", "text"])
    assert out[0]["ok"] and out[0]["row_invariant"]["ok"]


def test_cli_alias_requires_index_or_drop(spark, capsys):
    with pytest.raises(SystemExit):
        main(["alias", "--alias", "/tmp/nope_alias"])


def test_cli_maintenance_commands(spark, tmp_path, capsys):
    """delete-by-query / update-by-query / reindex / rollover drive the
    maintenance APIs end-to-end from the CLI."""
    src = str(tmp_path / "m-000001")
    rc = main(["build", "--input", f"{SF}/documents.parquet",
               "--index", src, "--id-col", "doc_id", "--text-col", "text",
               "--analyzer", "simple", "--n-segments", "2",
               "--n-buckets", "2", "--n-groups", "1",
               "--shuffle-partitions", "4"])
    assert rc == 0

    out = _run(capsys, ["update-by-query", "--index", src,
                        "--query", "spark",
                        "--set", "lang=upper(lang)"])
    assert out[-1]["updated"] > 0

    dest = str(tmp_path / "re")
    out = _run(capsys, ["reindex", "--index", src, "--dest", dest,
                        "--query", "spark"])
    assert out[-1]["n_docs"] > 0

    out = _run(capsys, ["delete-by-query", "--index", src,
                        "--query", "spark"])
    n_del = out[-1]["deleted"]
    assert n_del == out[-2 if len(out) > 1 else -1]["deleted"]
    assert n_del > 0
    out = _run(capsys, ["count", "--index", src, "--query", "spark"])
    assert out[-1]["count"] == 0

    alias = str(tmp_path / "m_write")
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    catalog.create_alias(alias, src)
    out = _run(capsys, ["rollover", "--alias", alias, "--max-docs", "1"])
    assert out[-1]["rolled_over"] and out[-1]["new_index"].endswith("000002")


def test_cli_cat_apis(spark, cli_index, capsys, tmp_path):
    """_cat indices/segments/aliases: vitals without a Spark job."""
    from elasticsearch_osmosis_plugin_spark.plans.build import load_meta
    from elasticsearch_osmosis_plugin_spark.plans.catalog import create_alias

    meta = load_meta(cli_index)
    (rows,) = _run(capsys, ["cat", "indices", cli_index])
    (row,) = rows
    assert row["health"] == "green"
    # the module-scoped index may already carry tombstones from the
    # delete test — vitals must reflect them, not a fresh-index guess
    assert row["docs_deleted"] == int(meta.get("tombstones_n") or 0)
    assert row["docs_count"] == meta["n_docs"] - row["docs_deleted"]
    assert row["store_size_bytes"] > 0 and row["n_buckets"] == 4

    (segs,) = _run(capsys, ["cat", "segments", cli_index])
    assert len(segs) >= 1
    assert all(s["size_bytes"] > 0 and s["files"] > 0 for s in segs)

    alias = str(tmp_path / "cur")
    create_alias(alias, cli_index)
    (als,) = _run(capsys, ["cat", "aliases", alias, cli_index])
    assert als == [{"alias": "cur", "index": "index", "health": "green"}]

    # broken path -> red, not an exception
    (bad,) = _run(capsys, ["cat", "indices", str(tmp_path / "nope")])
    assert bad[0]["health"] == "red"


def test_cli_lifecycle_commands(spark, cli_index, capsys, tmp_path):
    """clone / shrink / split / pit / terms-enum / ilm through the CLI."""
    from elasticsearch_osmosis_plugin_spark.plans.catalog import create_alias

    (c,) = _run(capsys, ["clone", "--index", cli_index,
                         "--to", str(tmp_path / "cl")])
    assert c["n_docs"] > 0

    (sh,) = _run(capsys, ["shrink", "--index", cli_index,
                          "--to", str(tmp_path / "sh"), "--n-buckets", "2",
                          "--shuffle-partitions", "4"])
    assert sh["n_buckets"] == 2
    (sp,) = _run(capsys, ["split", "--index", cli_index,
                          "--to", str(tmp_path / "sp"), "--n-buckets", "8",
                          "--shuffle-partitions", "4"])
    assert sp["n_buckets"] == 8

    (p,) = _run(capsys, ["pit", "open", "--index", cli_index])
    assert "/.pit/" in p["pit_id"]
    (cl,) = _run(capsys, ["pit", "close", "--id", p["pit_id"]])
    assert cl["succeeded"] is True

    rows = _run(capsys, ["terms-enum", "--index", cli_index,
                         "--prefix", "p", "--size", "5",
                         "--shuffle-partitions", "4"])
    assert rows and all(r["term"].startswith("p") for r in rows)

    alias = str(tmp_path / "ilm_alias")
    create_alias(alias, cli_index)
    (r,) = _run(capsys, ["ilm", "--alias", alias, "--max-docs", "1"])
    assert r["rollover"]["rolled_over"] is True


def test_cli_query_local_matches_query(spark, cli_index, capsys):
    """query-local (serving path, no Spark session) == query."""
    local = _run(capsys, ["query-local", "--index", cli_index,
                          "--query", "spark query join", "--k", "5"])
    dist = _run(capsys, ["query", "--index", cli_index,
                         "--query", "spark query join", "--k", "5",
                         "--strategy", "scoreall",
                         "--shuffle-partitions", "4"])
    assert [(r["doc_id"], round(r["score"], 9)) for r in local] == \
        [(r["doc_id"], round(r["score"], 9)) for r in dist]


def test_cli_template_commands(capsys, tmp_path):
    import json as _json

    r = str(tmp_path / "reg")
    _run(capsys, ["template", "put-component", "--registry", r,
                  "--name", "base",
                  "--body", _json.dumps({"settings": {"block_size": 32}})])
    _run(capsys, ["template", "put-index", "--registry", r,
                  "--name", "logs",
                  "--body", _json.dumps({
                      "index_patterns": ["logs-*"],
                      "composed_of": ["base"], "priority": 5})])
    sim = _run(capsys, ["template", "simulate", "--registry", r,
                        "--index-name", "logs-0001"])[0]
    assert sim["template"] == "logs" and \
        sim["settings"] == {"block_size": 32}
    assert _run(capsys, ["template", "list", "--registry", r])[0] == ["logs"]
    assert _run(capsys, ["template", "delete", "--registry", r,
                         "--name", "logs"])[0]["acknowledged"]
    assert _run(capsys, ["template", "simulate", "--registry", r,
                         "--index-name", "logs-0001"])[0] is None


def test_cli_graph_datastream_watch(spark, cli_index, capsys, tmp_path):
    """Round-3c surfaces through the CLI: _graph/explore, data streams,
    watcher — JSON in, JSON out, no library imports needed."""
    # graph explore over the built index
    body = {"query": {"match": {"text": "spark"}},
            "vertices": [{"field": "text", "size": 3, "min_doc_count": 2}],
            "connections": {"vertices": [{"field": "text", "size": 3,
                                          "min_doc_count": 2}]},
            "controls": {"sample_size": 100000}}
    out, = _run(capsys, ["graph-explore", "--index", cli_index,
                         "--body", json.dumps(body), "--field", "text"])
    assert out["vertices"] and out["connections"]
    assert {v["depth"] for v in out["vertices"]} == {0, 1}

    # data stream: create -> append -> rollover -> search -> stats
    root = str(tmp_path / "streams")
    os.makedirs(root)
    man, = _run(capsys, ["datastream", "create", "--root", root,
                         "--name", "logs"])
    assert man["generation"] == 1
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = pq.read_table(f"{SF}/documents.parquet")
    src = src.append_column(
        "@timestamp", pa.array([0] * src.num_rows, pa.timestamp("us")))
    inp = str(tmp_path / "docs.parquet")
    pq.write_table(src, inp)
    _run(capsys, ["datastream", "append", "--root", root, "--name", "logs",
                  "--input", inp, "--id-col", "doc_id",
                  "--text-col", "text"])
    ro, = _run(capsys, ["datastream", "rollover", "--root", root,
                        "--name", "logs"])
    assert ro["rolled_over"]
    st, = _run(capsys, ["datastream", "stats", "--root", root,
                        "--name", "logs"])
    assert st["generation"] == 2 and st["total_docs"] == src.num_rows
    hits = _run(capsys, ["datastream", "search", "--root", root,
                         "--name", "logs", "--query", "spark query",
                         "-k", "5"])
    assert len(hits) == 5

    # watcher: put -> execute -> ack -> execute(throttled)
    reg = str(tmp_path / "reg")
    wbody = {"trigger": {"schedule": {"interval": "5m"}},
             "input": {"search": {"request": {
                 "indices": [cli_index],
                 "body": {"query": {"match": {"text": "spark"}},
                          "size": 50}}}},
             "condition": {"compare": {"ctx.payload.hits.total":
                                       {"gte": 1}}},
             "actions": {"l": {"logging":
                               {"text": "{{ctx.payload.hits.total}}"}}}}
    _run(capsys, ["watch", "put", "--registry", reg, "--id", "w1",
                  "--body", json.dumps(wbody)])
    r1, = _run(capsys, ["watch", "execute", "--registry", reg, "--id", "w1",
                        "--trigger-time", "2026-01-01T00:00:00"])
    assert r1["condition_met"] and r1["actions"]["l"]["status"] == "success"
    _run(capsys, ["watch", "ack", "--registry", reg, "--id", "w1"])
    r2, = _run(capsys, ["watch", "execute", "--registry", reg, "--id", "w1",
                        "--trigger-time", "2026-01-01T00:05:00"])
    assert r2["actions"]["l"]["status"] == "throttled"


def test_cli_esql_and_sql(spark, capsys):
    rows = _run(capsys, [
        "esql", "--query",
        'FROM ev | STATS n = COUNT(*) BY event_type | SORT event_type',
        "--table", f"ev={SF}/events.parquet",
        "--shuffle-partitions", "4"])
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").count()
            .withColumnRenamed("count", "n").collect()}
    assert {r["event_type"]: r["n"] for r in rows} == want

    rows = _run(capsys, [
        "sql", "--query",
        "SELECT doc_id, SCORE() AS s FROM d WHERE MATCH(text, 'spark') "
        "ORDER BY SCORE() DESC, doc_id LIMIT 3",
        "--table", f"d={SF}/documents.parquet",
        "--shuffle-partitions", "4"])
    assert len(rows) == 3 and rows[0]["s"] >= rows[-1]["s"]


def test_cli_esql_index_fast_path(spark, cli_index, capsys):
    """esql --index routes through the esql_index fast path and
    matches the library call; --index + --table is rejected."""
    from elasticsearch_osmosis_plugin_spark.operators.esql import esql_index

    q = ('FROM docs METADATA _score | WHERE MATCH(text, "spark query join") '
         '| SORT _score DESC, doc_id | LIMIT 5')
    rows = _run(capsys, ["esql", "--query", q, "--index", cli_index,
                         "--shuffle-partitions", "4"])
    want = [r["doc_id"] for r in esql_index(spark, q, cli_index).collect()]
    assert [r["doc_id"] for r in rows] == want and len(rows) == 5
    with pytest.raises(SystemExit):
        main(["esql", "--query", q, "--index", cli_index,
              "--table", f"d={SF}/documents.parquet"])
