"""DAO semantics mirrored from the reference's EntityDao tests
(EntityDaoITest.java): save/find round trip, order-preserving
multi-get, delete found/absent, quarantine of unsupported kinds."""

import pytest

from elasticsearch_osmosis_plugin_spark.operators import dao


@pytest.fixture()
def store(spark, tmp_path):
    root = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [("node", i, f"payload{i}") for i in range(1, 11)]
        + [("way", 1, "w1"), ("relation", 7, "r7")],
        "kind string, id long, body string")
    quarantine = dao.save_all(spark, root, rows)
    return root, quarantine


def test_quarantine_not_silent(spark, store):
    root, q = store
    got = q.collect()
    assert [(r["kind"], r["id"]) for r in got] == [("relation", 7)]


def test_find_roundtrip_and_missing(spark, store):
    root, _ = store
    assert dao.find(spark, root, "node", 3)["body"] == "payload3"
    with pytest.raises(dao.DaoError):
        dao.find(spark, root, "node", 999)


def test_find_all_keeps_request_order(spark, store):
    # reference: findAllNodes_keepOrder, EntityDaoITest.java:266-280
    root, _ = store
    got = dao.find_all(spark, root, "node", [5, 3, 9, 1, 7]).collect()
    assert [r["id"] for r in got] == [5, 3, 9, 1, 7]
    # missing ids silently dropped, order still preserved
    got2 = dao.find_all(spark, root, "node", [5, 999, 3]).collect()
    assert [r["id"] for r in got2] == [5, 3]


def test_upsert_overwrites(spark, store):
    root, _ = store
    upd = spark.createDataFrame([("node", 3, "NEW")], "kind string, id long, body string")
    dao.save_all(spark, root, upd)
    assert dao.find(spark, root, "node", 3)["body"] == "NEW"
    assert dao.count_by_kind(spark, root).filter("kind='node'").collect()[0]["n"] == 10


def test_delete_found_and_absent(spark, store):
    root, _ = store
    assert dao.delete(spark, root, "node", 3) is True
    assert dao.delete(spark, root, "node", 3) is False
    with pytest.raises(dao.DaoError):
        dao.find(spark, root, "node", 3)


def test_count_by_kind(spark, store):
    root, _ = store
    got = {r["kind"]: r["n"] for r in dao.count_by_kind(spark, root).collect()}
    assert got == {"node": 10, "way": 1}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The r1 scale-killer fix: an upsert must leave every untouched
    (kind, bkt) partition's files alone (mtimes unchanged), rewriting
    only the partitions its keys hash into."""
    import os

    root = str(tmp_path / "bstore")
    rows = spark.createDataFrame(
        [("node", i, f"payload{i}") for i in range(1, 101)],
        "kind string, id long, body string")
    dao.save_all(spark, root, rows)

    store_dir = os.path.join(root, dao.DOCSTORE, "kind=node")
    before = {d: os.path.getmtime(os.path.join(store_dir, d))
              for d in os.listdir(store_dir)}
    assert len(before) > 4  # multiple buckets actually populated

    touched_bkt = dao._bkt_py("node", 3)
    upd = spark.createDataFrame([("node", 3, "NEW")],
                                "kind string, id long, body string")
    dao.save_all(spark, root, upd)

    after = {d: os.path.getmtime(os.path.join(store_dir, d))
             for d in os.listdir(store_dir)}
    assert after.keys() == before.keys()
    for d in before:
        if d == f"bkt={touched_bkt}":
            assert after[d] != before[d]
        else:
            assert after[d] == before[d], d
    # and the merge semantics held
    assert dao.find(spark, root, "node", 3)["body"] == "NEW"
    assert dao.count_by_kind(spark, root).collect()[0]["n"] == 100


def test_delete_rewrites_only_its_bucket(spark, tmp_path):
    import os

    root = str(tmp_path / "dstore")
    rows = spark.createDataFrame(
        [("node", i, f"p{i}") for i in range(1, 101)],
        "kind string, id long, body string")
    dao.save_all(spark, root, rows)
    store_dir = os.path.join(root, dao.DOCSTORE, "kind=node")
    before = {d: os.path.getmtime(os.path.join(store_dir, d))
              for d in os.listdir(store_dir)}
    assert dao.delete(spark, root, "node", 7) is True
    b = f"bkt={dao._bkt_py('node', 7)}"
    after = {d: os.path.getmtime(os.path.join(store_dir, d))
             for d in os.listdir(store_dir)}
    for d in before:
        if d != b:
            assert after[d] == before[d], d
    assert dao.count_by_kind(spark, root).collect()[0]["n"] == 99


def test_update_partial_merge(spark, store):
    """ES _update analog: field overlay on an existing doc; absent doc
    raises; key columns and unknown fields rejected; untouched docs
    and other fields survive."""
    root, _ = store
    merged = dao.update(spark, root, "node", 3, {"body": "PATCHED"})
    assert merged["body"] == "PATCHED"
    assert dao.find(spark, root, "node", 3)["body"] == "PATCHED"
    assert dao.find(spark, root, "node", 4)["body"] == "payload4"
    assert dao.count_by_kind(spark, root).filter("kind='node'") \
        .collect()[0]["n"] == 10
    with pytest.raises(dao.DaoError):
        dao.update(spark, root, "node", 999, {"body": "x"})
    with pytest.raises(ValueError):
        dao.update(spark, root, "node", 3, {"nope": 1})
    with pytest.raises(ValueError):
        dao.update(spark, root, "node", 3, {"id": 4})


def test_update_on_custom_kind_store(spark, tmp_path):
    """update must write through for stores built with non-default
    supported_kinds (a quarantined merge row would be a silent no-op)."""
    root = str(tmp_path / "relstore")
    rows = spark.createDataFrame([("relation", 7, "r7")],
                                 "kind string, id long, body string")
    dao.save_all(spark, root, rows, supported_kinds=("relation",))
    merged = dao.update(spark, root, "relation", 7, {"body": "R7v2"})
    assert merged["body"] == "R7v2"
    assert dao.find(spark, root, "relation", 7)["body"] == "R7v2"


def test_update_script_and_upsert(spark, store):
    """ES scripted update + upsert: the script sees the CURRENT row
    (post-fields overlay), upsert inserts on absent ids, scripts skip
    the upsert insert (ES default mode)."""
    root, _ = store
    # scripted: derive from current values
    merged = dao.update(spark, root, "node", 3,
                        script={"body": "concat(body, '!')"})
    assert merged["body"] == "payload3!"
    # fields apply BEFORE the script
    merged = dao.update(spark, root, "node", 3, fields={"body": "x"},
                        script={"body": "upper(body)"})
    assert merged["body"] == "X"
    # script on unknown / key columns rejected
    with pytest.raises(ValueError):
        dao.update(spark, root, "node", 3, script={"nope": "1"})
    with pytest.raises(ValueError):
        dao.update(spark, root, "node", 3, script={"id": "id + 1"})
    # upsert: absent id inserts the upsert doc, script does NOT run
    got = dao.update(spark, root, "node", 500, fields={"body": "ignored"},
                     script={"body": "upper(body)"},
                     upsert={"body": "fresh"})
    assert got["body"] == "fresh" and got["id"] == 500
    # present id: upsert ignored, normal update path
    got = dao.update(spark, root, "node", 500, fields={"body": "v2"},
                     upsert={"body": "nope"})
    assert got["body"] == "v2"
    # absent + no upsert still raises
    with pytest.raises(dao.DaoError):
        dao.update(spark, root, "node", 901, fields={"body": "x"})
    # a typo'd upsert column must fail loudly, not vanish (same
    # contract as the fields/script path)
    with pytest.raises(ValueError, match="unknown fields"):
        dao.update(spark, root, "node", 902, upsert={"bodyy": "x"})
    with pytest.raises(dao.DaoError):
        dao.find(spark, root, "node", 902)  # nothing was inserted
