"""_delete_by_query / _update_by_query / _reindex / significant_text /
_mtermvectors — the ES maintenance surface over the persisted index."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.operators import intersect
from elasticsearch_osmosis_plugin_spark.operators.query import (
    delete_by_query,
    reindex,
    scan_df,
    topk,
    update_by_query,
)
from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.build import build_index, load_meta

CFG = EngineConfig(n_segments=4, n_buckets=4, block_size=16)


@pytest.fixture()
def mut_index(spark, corpus_df, tmp_path):
    """Function-scoped: these tests mutate the index."""
    path = str(tmp_path / "mutidx")
    build_index(spark, corpus_df, path, CFG, id_col="doc_id", n_groups=1)
    return path


def test_delete_by_query(spark, mut_index):
    want = {r["doc_id"] for r in
            intersect.match_any_terms(spark, mut_index, "id0042").collect()}
    assert want
    n = delete_by_query(spark, mut_index, "id0042")
    assert n == len(want)
    assert intersect.match_any_terms(spark, mut_index, "id0042").count() == 0
    # survivors still queryable; deleted ids gone from every path
    alive = {r["doc_id"] for r in scan_df(spark, mut_index).collect()}
    assert alive and not (alive & want)
    # idempotent: nothing new to delete
    assert delete_by_query(spark, mut_index, "id0042") == 0
    # post_filter-only delete (match_all + predicate)
    java = {r["doc_id"] for r in
            catalog.read_table(spark, mut_index, "docstats")
            .filter(F.col("lang") == "java").select("doc_id").collect()}
    n2 = delete_by_query(spark, mut_index, None,
                         post_filter=F.col("lang") == "java")
    assert n2 == len(java - want)


def test_update_by_query(spark, mut_index):
    hit = {r["doc_id"] for r in
           intersect.match_any_terms(spark, mut_index, "id0042").collect()}
    n = update_by_query(spark, mut_index,
                        {"repo": "concat(repo, '-hit')",
                         "lang": "upper(lang)"},
                        "id0042")
    assert n == len(hit) > 0
    ds = catalog.read_table(spark, mut_index, "docstats")
    for r in ds.select("doc_id", "repo", "lang").collect():
        assert r["repo"].endswith("-hit") == (r["doc_id"] in hit)
        assert (r["lang"] == r["lang"].upper()) == (r["doc_id"] in hit) \
            or r["lang"] is None
    # manifest survived the swap (term vectors still advertised)
    assert catalog.read_manifest(mut_index, "docstats")["term_vectors"]
    assert catalog.read_manifest(
        mut_index, "docstats")["updated_by_query"] == n
    # queries still run after the docstats rewrite
    assert topk(spark, mut_index, "public static", k=5).count() == 5
    with pytest.raises(ValueError):
        update_by_query(spark, mut_index, {"dl": "dl + 1"}, "id0042")
    with pytest.raises(ValueError):
        update_by_query(spark, mut_index, {"nope": "1"}, "id0042")


def test_reindex_full_and_filtered(spark, mut_index, tmp_path):
    dest = str(tmp_path / "re_full")
    meta = reindex(spark, mut_index, dest)
    assert meta["n_docs"] == load_meta(mut_index)["n_docs"]
    for q in ["public static", "id0042 id0007", "getIndexBuffer"]:
        src_ids = [r["doc_id"] for r in
                   topk(spark, mut_index, q, k=10).collect()]
        dst_ids = [r["doc_id"] for r in topk(spark, dest, q, k=10).collect()]
        assert src_ids == dst_ids, q
    # tombstoned docs are dropped for real in the new index
    n_del = delete_by_query(spark, mut_index, "id0042")
    dest2 = str(tmp_path / "re_live")
    meta2 = reindex(spark, mut_index, dest2)
    assert meta2["n_docs"] == meta["n_docs"] - n_del
    assert intersect.match_any_terms(spark, dest2, "id0042").count() == 0
    assert not meta2.get("tombstones_n")
    # query-filtered reindex: the new corpus IS the hit subset
    dest3 = str(tmp_path / "re_sub")
    want = {r["doc_id"] for r in
            scan_df(spark, mut_index, "public").collect()}
    meta3 = reindex(spark, mut_index, dest3, query="public")
    assert meta3["n_docs"] == len(want)
    got = {r["doc_id"] for r in scan_df(spark, dest3).collect()}
    assert got == want


def test_significant_text_dedups_boilerplate(spark, tmp_path):
    """50 copies of a boilerplate hit inflate significant_terms but
    count once under significant_text's filter_duplicate_text."""
    boiler = "apple banana cherry"
    rows = [(i, boiler) for i in range(50)] \
        + [(100 + i, f"apple distinct{i} word{i % 3}") for i in range(6)] \
        + [(200 + i, f"other text{i} banana") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    path = str(tmp_path / "sigidx")
    build_index(spark, df, path, EngineConfig(
        analyzer="simple", n_segments=2, n_buckets=2, block_size=16),
        id_col="doc_id", n_groups=1)
    st = {r["term"]: r for r in intersect.significant_terms(
        spark, path, "apple", size=50, min_doc_count=1).collect()}
    sx = {r["term"]: r for r in intersect.significant_text(
        spark, path, "apple", size=50, min_doc_count=1).collect()}
    # the boilerplate group collapses to ONE foreground doc
    assert st["cherry"]["df_fg"] == 50
    assert sx["cherry"]["df_fg"] == 1
    # fg universe: 50 dups -> 1, plus the 6 distinct docs
    assert sx["apple"]["df_fg"] == 7
    # dedup off == significant_terms exactly
    raw = {r["term"]: tuple(r) for r in intersect.significant_text(
        spark, path, "apple", size=50, min_doc_count=1,
        filter_duplicate_text=False).collect()}
    assert raw == {r["term"]: tuple(r) for r in
                   intersect.significant_terms(
                       spark, path, "apple", size=50,
                       min_doc_count=1).collect()}


def test_mtermvectors_matches_solo(spark, mut_index):
    solo7 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
             for r in intersect.term_vectors(spark, mut_index, 7).collect()]
    solo9 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
             for r in intersect.term_vectors(spark, mut_index, 9).collect()]
    got = intersect.mtermvectors(spark, mut_index, [7, 9, 10**9]).collect()
    got7 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
            for r in got if r["doc_id"] == 7]
    got9 = [(r["term"], r["tf"], list(r["positions"]), r["df"], r["cf"])
            for r in got if r["doc_id"] == 9]
    assert got7 == solo7 and got9 == solo9
    assert {r["doc_id"] for r in got} == {7, 9}


def test_rollover(spark, corpus_df, tmp_path):
    from elasticsearch_osmosis_plugin_spark.plans.catalog import (
        resolve_alias,
        rollover,
    )
    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat

    base = str(tmp_path / "logs-000001")
    alias = str(tmp_path / "logs_write")
    build_index(spark, corpus_df, base, CFG, id_col="doc_id", n_groups=1)
    cat.create_alias(alias, base)
    # below threshold: no roll
    r = rollover(alias, max_docs=10**6)
    assert not r["rolled_over"] and r["new_index"] is None
    assert resolve_alias(alias) == base
    # over threshold: new generation, alias repointed, old untouched
    r = rollover(alias, max_docs=10)
    assert r["rolled_over"] and r["new_index"].endswith("logs-000002")
    assert resolve_alias(alias) == r["new_index"]
    assert topk(spark, base, "public static", k=5).count() == 5
    # the fresh generation is empty until something builds into it
    r2 = rollover(alias, max_docs=10)
    assert not r2["rolled_over"]
    # building through the alias materializes generation 2
    build_index(spark, corpus_df.limit(20), alias, CFG,
                id_col="doc_id", n_groups=1)
    assert load_meta(alias)["n_docs"] == 20
    assert topk(spark, alias, "public", k=3).count() >= 1
    assert load_meta(base)["n_docs"] == corpus_df.count()
    with pytest.raises(FileNotFoundError):
        rollover(base, max_docs=1)  # not an alias


def test_shrink_index_hardlink_rank_identity(spark, corpus_df, tmp_path):
    import os

    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        match_phrase,
    )
    from elasticsearch_osmosis_plugin_spark.plans.build import bucket_of
    from elasticsearch_osmosis_plugin_spark.plans.merge import shrink_index

    src = str(tmp_path / "src")
    build_index(spark, corpus_df, src,
                EngineConfig(n_segments=4, n_buckets=8, block_size=16),
                id_col="doc_id", n_groups=1)
    want = topk(spark, src, "public static void", k=10).collect()
    ph = {r["doc_id"] for r in
          match_phrase(spark, src, "id0000 id0000").collect()}

    dst = str(tmp_path / "small")
    meta = shrink_index(spark, src, dst, 2)
    assert meta["n_buckets"] == 2
    got = topk(spark, dst, "public static void", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]
    # positional postings survive the remap
    assert {r["doc_id"] for r in
            match_phrase(spark, dst, "id0000 id0000").collect()} == ph

    # zero-copy: every data file in the shrunk index is a HARDLINK of a
    # source file (same inode), and bucket dirs really coalesced
    pdir = os.path.join(dst, "postings", "group=0")
    bdirs = sorted(d for d in os.listdir(pdir) if d.startswith("bucket="))
    assert bdirs == ["bucket=0", "bucket=1"]
    src_inodes = {os.stat(os.path.join(r, f)).st_ino
                  for r, _, fs in os.walk(src) for f in fs}
    linked = [os.path.join(r, f)
              for r, _, fs in os.walk(pdir) for f in fs
              if f.endswith(".parquet")]
    assert linked
    assert all(os.stat(p).st_ino in src_inodes for p in linked)
    # routing arithmetic: md5 % 8 coalesced by % 2 == md5 % 2
    assert all(bucket_of(t, 8) % 2 == bucket_of(t, 2)
               for t in ("public", "static", "void", "id0000"))

    # the SOURCE index is untouched (hardlinked meta must not be
    # truncated in place — regression: shrink once rewrote the shared
    # inode and flipped the source's n_buckets)
    assert load_meta(src)["n_buckets"] == 8
    again = topk(spark, src, "public static void", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in again] == \
        [(r["doc_id"], r["score"]) for r in want]

    with pytest.raises(ValueError):
        shrink_index(spark, src, str(tmp_path / "bad"), 3)
    with pytest.raises(ValueError):
        shrink_index(spark, src, str(tmp_path / "bad"), 8)


def test_split_index_rank_identity_docstats_hardlinked(spark, corpus_df,
                                                       tmp_path):
    import os

    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        match_phrase,
    )
    from elasticsearch_osmosis_plugin_spark.plans.merge import split_index

    src = str(tmp_path / "src")
    build_index(spark, corpus_df, src,
                EngineConfig(n_segments=4, n_buckets=4, block_size=16),
                id_col="doc_id", n_groups=1)
    want = topk(spark, src, "public static void", k=10).collect()
    ph = {r["doc_id"] for r in
          match_phrase(spark, src, "id0000 id0000").collect()}

    dst = str(tmp_path / "wide")
    meta = split_index(spark, src, dst, 16)
    assert meta["n_buckets"] == 16
    got = topk(spark, dst, "public static void", k=10).collect()
    # rank-identical; scores to float-reassociation tolerance (the
    # repartition changes partial-sum order)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9 * abs(w["score"])
    assert {r["doc_id"] for r in
            match_phrase(spark, dst, "id0000 id0000").collect()} == ph

    # the corpus-sized table is NOT rewritten: docstats files hardlink
    # to the source (split touches posting rows only)
    src_inodes = {os.stat(os.path.join(r, f)).st_ino
                  for r, _, fs in os.walk(os.path.join(src, "docstats"))
                  for f in fs}
    dsts = [os.path.join(r, f)
            for r, _, fs in os.walk(os.path.join(dst, "docstats"))
            for f in fs]
    assert dsts and all(os.stat(p).st_ino in src_inodes for p in dsts)
    # postings really spread over more buckets than before
    pdir = os.path.join(dst, "postings", "group=0")
    assert len([d for d in os.listdir(pdir)
                if d.startswith("bucket=")]) > 4

    # source untouched (same hardlink-truncation regression guard)
    assert load_meta(src)["n_buckets"] == 4

    with pytest.raises(ValueError):
        split_index(spark, src, str(tmp_path / "bad"), 6)
    with pytest.raises(ValueError):
        split_index(spark, src, str(tmp_path / "bad"), 4)


def test_ingest_pipeline_processors(spark):
    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
        simulate_pipeline,
    )

    rows = simulate_pipeline(spark, [
        {"dissect": {"field": "msg",
                     "pattern": "%{ip} - %{verb} %{path}"}},
        {"uppercase": {"field": "verb"}},
        {"rename": {"field": "msg", "target_field": "raw"}},
        {"set": {"field": "site", "value": "eu", "if": "ip like '10.%'"}},
        {"set": {"field": "code2", "copy_from": "code", "override": False}},
        {"convert": {"field": "code2", "type": "long"}},
        {"gsub": {"field": "path", "pattern": "/+", "replacement": "/"}},
        {"split": {"field": "path", "separator": "/",
                   "target_field": "segs"}},
        {"remove": {"field": "code"}},
    ], [
        {"msg": "10.0.0.3 - get //a//b", "code": "200"},
        {"msg": "192.168.1.9 - post /c", "code": None},
    ]).collect()
    by_ip = {r["ip"]: r for r in rows}
    a = by_ip["10.0.0.3"]
    assert (a["verb"], a["path"], a["site"], a["code2"],
            list(a["segs"])) == ("GET", "/a/b", "eu", 200, ["", "a", "b"])
    b = by_ip["192.168.1.9"]
    assert b["verb"] == "POST" and b["site"] is None
    assert b["code2"] is None  # override=False kept NULL; convert -> NULL
    assert "code" not in rows[0].asDict() and "msg" not in rows[0].asDict()
    assert a["raw"].startswith("10.0.0.3")

    # chain folds into one projection: no shuffle, single scan
    df = spark.createDataFrame([("x y", 1)], "msg string, code long")
    out = apply_pipeline(df, [
        {"dissect": {"field": "msg", "pattern": "%{a} %{b}"}},
        {"uppercase": {"field": "a"}},
        {"script": {"target_field": "c", "source": "code * 2"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with pytest.raises(ValueError):
        apply_pipeline(df, [{"nope": {}}])
    with pytest.raises(ValueError):
        apply_pipeline(df, [{"set": {"field": "x", "value": 1},
                             "gsub": {}}])


def test_ingest_pipeline_conditional_rename_remove(spark):
    """Per-document `if` on schema-level processors: rename rejects it
    (half the rows can't live under the old name); remove maps to
    set-to-null on matching rows so non-matching rows keep their
    value — a conditional remove must NOT strip the field from every
    document."""
    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "name string, v long")
    with pytest.raises(ValueError, match="rename"):
        apply_pipeline(df, [{"rename": {
            "field": "name", "target_field": "n2", "if": "v > 1"}}])

    out = apply_pipeline(df, [{"remove": {"field": "name",
                                          "if": "v > 1"}}])
    rows = {r["v"]: r["name"] for r in out.collect()}
    assert rows == {1: "a", 2: None}
    # multi-field conditional remove nulls each listed field per-row
    out2 = apply_pipeline(
        df.withColumn("x", F.lit("keep")),
        [{"remove": {"field": ["name", "x"], "if": "v = 1"}}])
    r1 = {r["v"]: (r["name"], r["x"]) for r in out2.collect()}
    assert r1 == {1: (None, None), 2: ("b", "keep")}
    # unconditional remove still drops the column
    assert "name" not in apply_pipeline(
        df, [{"remove": {"field": "name"}}]).columns


def test_ilm_policy_and_incremental_snapshot(spark, corpus_df, tmp_path):
    """apply_ilm: hot-phase rollover + delete-phase retention; the
    current generation survives any retention setting. Incremental
    snapshots hardlink (inode identity), stay queryable, and survive
    later mutation of the live index."""
    import os

    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat
    from elasticsearch_osmosis_plugin_spark.plans.build import delete_docs

    base = str(tmp_path / "app-000001")
    alias = str(tmp_path / "app_write")
    build_index(spark, corpus_df, base, CFG, id_col="doc_id", n_groups=1)
    cat.create_alias(alias, base)

    # incremental snapshot: hardlinked, rank-identical
    snap = str(tmp_path / "snap1")
    cat.snapshot_index(base, snap, incremental=True)
    src_file = next(
        os.path.join(dp, f) for dp, _, fs in os.walk(base) for f in fs
        if f.endswith(".parquet"))
    twin = os.path.join(snap, os.path.relpath(src_file, base))
    assert os.stat(src_file).st_ino == os.stat(twin).st_ino
    before = [(r["doc_id"], round(r["score"], 9))
              for r in topk(spark, base, "public static", k=5).collect()]
    assert [(r["doc_id"], round(r["score"], 9))
            for r in topk(spark, snap, "public static", k=5).collect()] \
        == before
    # mutate the live index; the snapshot must not move
    delete_docs(spark, base, [before[0][0]])
    assert topk(spark, base, "public static", k=5).collect()[0]["doc_id"] \
        != before[0][0]
    assert [(r["doc_id"], round(r["score"], 9))
            for r in topk(spark, snap, "public static", k=5).collect()] \
        == before

    # ILM: roll twice, then retention keeps the newest 2 generations
    r = cat.apply_ilm(alias, {"rollover": {"max_docs": 10}})
    assert r["rollover"]["rolled_over"] and not r["deleted"]
    build_index(spark, corpus_df.limit(30), alias, CFG,
                id_col="doc_id", n_groups=1)
    r = cat.apply_ilm(alias, {"rollover": {"max_docs": 10},
                              "retention": {"max_generations": 2}})
    assert r["rollover"]["rolled_over"]
    assert r["deleted"] == [base]          # oldest generation dropped
    assert not os.path.exists(base)
    assert os.path.exists(r["rollover"]["old_index"])
    assert cat.resolve_alias(alias) == r["rollover"]["new_index"]
    # retention never deletes the live generation
    r = cat.apply_ilm(alias, {"retention": {"max_generations": 0}})
    assert cat.resolve_alias(alias) not in r["deleted"]
    assert os.path.exists(cat.resolve_alias(alias))


def test_pit_and_search_shards(spark, corpus_df, tmp_path):
    """PIT freezes results across live mutation; search_shards reports
    the md5 bucket routing + dictionary presence."""
    import os

    from elasticsearch_osmosis_plugin_spark.operators.intersect import (
        search_shards,
    )
    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat
    from elasticsearch_osmosis_plugin_spark.plans.build import (
        bucket_of,
        delete_docs,
    )

    idx = str(tmp_path / "pitidx")
    build_index(spark, corpus_df, idx, CFG, id_col="doc_id", n_groups=1)
    pit = cat.open_pit(idx)
    before = [(r["doc_id"], round(r["score"], 9))
              for r in topk(spark, pit, "public static", k=5).collect()]
    delete_docs(spark, idx, [before[0][0]])
    # live moved, the PIT view did not
    assert topk(spark, idx, "public static", k=5).collect()[0]["doc_id"] \
        != before[0][0]
    assert [(r["doc_id"], round(r["score"], 9))
            for r in topk(spark, pit, "public static", k=5).collect()] \
        == before
    assert cat.close_pit(pit) is True
    assert not os.path.exists(pit)
    assert cat.close_pit(pit) is False
    assert cat.close_pit(idx) is False     # refuses non-PIT paths

    sh = {r["term"]: (r["bucket"], r["in_dictionary"])
          for r in search_shards(spark, idx, "public zzznotaterm").collect()}
    meta = load_meta(idx)
    assert sh["public"] == (bucket_of("public", meta["n_buckets"]), True)
    assert sh["zzznotaterm"][1] is False


def test_ingest_drop_and_date_processors(spark):
    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
    )

    df = spark.createDataFrame(
        [(1, 10, "2024-03-01T10:00:00"), (2, 60, "01/04/2024"),
         (3, None, "garbage")],
        "id long, v long, ts string")
    out = apply_pipeline(df, [
        {"drop": {"if": "v >= 50"}},
        {"date": {"field": "ts", "target_field": "t",
                  "formats": ["yyyy-MM-dd'T'HH:mm:ss", "dd/MM/yyyy"]}},
    ]).collect()
    rows = {r["id"]: r for r in out}
    assert set(rows) == {1, 3}            # v=60 dropped; NULL v kept
    assert rows[1]["t"].isoformat().startswith("2024-03-01T10:00")
    assert rows[3]["t"] is None           # unparseable -> NULL, not error
    # unconditional drop empties the frame
    assert apply_pipeline(df, [{"drop": {}}]).count() == 0


def test_clone_index(spark, corpus_df, tmp_path):
    """A clone serves identically, then diverges independently when
    appended to — the source never moves."""
    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat
    from elasticsearch_osmosis_plugin_spark.plans.build import (
        append_index_group,
    )

    src = str(tmp_path / "cl_src")
    build_index(spark, corpus_df.filter("doc_id < 60"), src, CFG,
                id_col="doc_id", n_groups=1)
    dst = str(tmp_path / "cl_dst")
    cat.clone_index(src, dst)

    def res(p):
        return [(r["doc_id"], round(r["score"], 9))
                for r in topk(spark, p, "public static", k=50).collect()]

    base = res(src)
    assert res(dst) == base and base
    append_index_group(spark, corpus_df.filter("doc_id >= 60"), dst,
                       id_col="doc_id")
    assert res(src) == base                   # source untouched
    assert len(res(dst)) >= len(base)
    with pytest.raises(FileExistsError):
        cat.clone_index(src, dst)


def test_index_and_component_templates(spark, corpus_df, tmp_path):
    """ES composable templates: component merge order, inline-template
    override, priority pick, pattern match, simulate, and an
    end-to-end build through template_config with alias creation."""
    from elasticsearch_osmosis_plugin_spark.operators.query import topk
    from elasticsearch_osmosis_plugin_spark.plans import catalog as cat

    r = str(tmp_path / "registry")
    cat.put_component_template(r, "base", {
        "settings": {"analyzer": "code", "block_size": 64,
                     "n_segments": 8}})
    cat.put_component_template(r, "hot", {
        "settings": {"n_buckets": 4}, "aliases": {"hot-read": {}}})
    cat.put_index_template(r, "logs", index_patterns=["logs-*"],
                           composed_of=["base", "hot"],
                           template={"settings": {"block_size": 32}},
                           priority=10)
    cat.put_index_template(r, "catchall", index_patterns=["*"], priority=1)

    sim = cat.simulate_index(r, "logs-2026.08")
    # component order then inline override: block_size 64 -> 32
    assert sim["template"] == "logs"
    assert sim["settings"] == {"analyzer": "code", "block_size": 32,
                               "n_segments": 8, "n_buckets": 4}
    assert sim["aliases"] == {"hot-read": {}}
    # lower-priority catchall still matches everything else
    assert cat.simulate_index(r, "other")["template"] == "catchall"

    # unknown component / section fail loudly
    with pytest.raises(FileNotFoundError):
        cat.put_index_template(r, "bad", index_patterns=["x"],
                               composed_of=["nope"])
    with pytest.raises(ValueError):
        cat.put_component_template(r, "bad", {"nope": {}})

    # end-to-end: template settings reach the build; aliases created
    cfg, aliases = cat.template_config(r, "logs-2026.08",
                                       {"n_segments": 4})
    assert (cfg.block_size, cfg.n_buckets, cfg.n_segments) == (32, 4, 4)
    idx = str(tmp_path / "logs-2026.08")
    build_index(spark, corpus_df, idx, cfg, id_col="doc_id", n_groups=1)
    assert load_meta(idx)["n_buckets"] == 4
    for a in aliases:
        cat.create_alias(str(tmp_path / a), idx)
    via_alias = topk(spark, str(tmp_path / "hot-read"),
                     "public static", k=5).collect()
    direct = topk(spark, idx, "public static", k=5).collect()
    assert [tuple(x) for x in via_alias] == [tuple(x) for x in direct]

    # registry introspection
    assert cat.list_templates(r, "index") == ["catchall", "logs"]
    assert cat.delete_template(r, "index", "catchall")
    assert cat.simulate_index(r, "other") is None


def test_ingest_enrich_processor(spark):
    from pyspark.sql import functions as F

    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
    )

    docs = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol")], "id long, user string")
    policy = spark.createDataFrame(
        [("alice", "eng", 3), ("bob", "sales", 1),
         ("alice", "eng", 3)],                 # dup key: max_matches=1
        "user string, dept string, level long")
    out = apply_pipeline(docs, [
        {"enrich": {"policy_name": "users", "field": "user",
                    "target_field": "u"}},
        {"script": {"target_field": "dept",
                    "source": "u.dept"}},
    ], enrich_tables={"users": policy})
    rows = {r["id"]: (r["dept"], r["u"]["level"] if r["u"] else None)
            for r in out.collect()}
    assert rows == {1: ("eng", 3), 2: ("sales", 1), 3: (None, None)}
    assert out.count() == 3                    # no row multiplication
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # conditional enrich: only rows passing `if` get the struct
    cond = apply_pipeline(docs, [
        {"enrich": {"policy_name": "users", "field": "user",
                    "target_field": "u", "if": "id = 1"}},
    ], enrich_tables={"users": policy})
    got = {r["id"]: r["u"] is not None for r in cond.collect()}
    assert got == {1: True, 2: False, 3: False}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown policy"):
        apply_pipeline(docs, [{"enrich": {
            "policy_name": "nope", "field": "user",
            "target_field": "u"}}])


def test_ingest_round4_processors(spark):
    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "a=1 b=2", '{"x":"1","y":"z"}', '5,hello,"wo,rld"',
          "1.5kb", "<b>Hi &amp; %26</b>&amp;lt;x",
          "https://u@h.example.com:8080/p/q?k=v#f")],
        "id int, kv string, js string, c string, by string, "
        "h string, url string")
    r = apply_pipeline(df, [
        {"kv": {"field": "kv", "target_field": "m",
                "prefix": "p_"}},
        {"json": {"field": "js", "target_field": "jm"}},
        {"csv": {"field": "c", "target_fields": ["n", "w1", "w2"]}},
        {"bytes": {"field": "by"}},
        {"html_strip": {"field": "h"}},
        {"urldecode": {"field": "h", "target_field": "dec"}},
        {"uri_parts": {"field": "url"}},
    ]).collect()[0]
    assert dict(r["m"]) == {"p_a": "1", "p_b": "2"}
    assert dict(r["jm"]) == {"x": "1", "y": "z"}
    assert (r["n"], r["w1"], r["w2"]) == ("5", "hello", "wo,rld")
    assert r["by"] == 1536
    # single-pass decode: tags gone, entities decoded ONCE —
    # escaped '&amp;lt;' yields literal '&lt;', never '<'
    assert r["h"] == "Hi & %26&lt;x"
    assert r["dec"] == "Hi & &&lt;x"     # then percent-decoded
    u = r["url"]
    assert (u["scheme"], u["domain"], u["path"], u["query"],
            u["fragment"], u["user_info"]) == \
        ("https", "h.example.com", "/p/q", "k=v", "f", "u")


def test_ingest_grok_append_fail(spark):
    from elasticsearch_osmosis_plugin_spark.operators.ingest_pipeline import (
        apply_pipeline,
    )

    df = spark.createDataFrame(
        [(1, "GET /a 200", ["x"]), (2, "oops 500", ["x", "x"])],
        "id int, log string, arr array<string>")
    rows = {r["id"]: r for r in apply_pipeline(df, [
        # first matching pattern wins: row 1 matches BOTH patterns and
        # must take verb/status from the first; row 2 only the second
        {"grok": {"field": "log", "patterns": [
            "%{WORD:verb} %{URIPATH:path} %{NUMBER:status:int}",
            "%{WORD:verb} %{NUMBER:status:int}"]}},
        {"append": {"field": "arr", "value": ["x", "y"],
                    "allow_duplicates": False}},
        {"append": {"field": "fresh", "value": "solo"}},
    ]).collect()}
    assert rows[1]["path"] == "/a" and rows[1]["status"] == 200
    assert rows[2]["path"] is None and rows[2]["status"] == 500
    assert rows[1]["arr"] == ["x", "y"]     # dedup kept order
    # allow_duplicates:false skips only NEW values already present;
    # pre-existing duplicates survive (ES: [x,x] + [x,y] -> [x,x,y])
    assert rows[2]["arr"] == ["x", "x", "y"]
    assert rows[1]["fresh"] == ["solo"]     # created when missing
    # fail: trips on matching rows, passes through otherwise
    ok = apply_pipeline(df, [{"fail": {"if": "id = 99",
                                       "message": "boom"}}])
    assert ok.count() == 2
    bad = apply_pipeline(df, [{"fail": {"if": "id = 2",
                                        "message": "boom"}}])
    with pytest.raises(Exception, match="boom"):
        bad.collect()
