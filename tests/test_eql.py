"""EQL sequence/funnel operators vs independent brute-force oracles.

The Spark plans (window-pointer chains for overlap="all", the greedy
Arrow kernel for overlap="skip", k-pass conditional-min for funnel)
are checked against naive pure-Python re-implementations of the
documented semantics on a crafted event log that includes timestamp
TIES, missing steps, span violations, and interleaved chains.
"""
from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_osmosis_plugin_spark.operators.eql import funnel, sequence

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# (event_id, minutes, user_id, event_type) — user 1: two interleaved
# chains + a span violation; user 2: timestamp TIE between click/error;
# user 3: missing middle step; user 4: chain exactly at maxspan.
EVENTS = [
    (1, 0, 1, "view"), (2, 5, 1, "view"), (3, 10, 1, "click"),
    (4, 20, 1, "error"), (5, 30, 1, "view"), (6, 200, 1, "click"),
    (7, 210, 1, "error"),
    (10, 0, 2, "view"), (11, 15, 2, "click"), (12, 15, 2, "error"),
    (13, 15, 2, "click"), (14, 40, 2, "error"),
    (20, 0, 3, "view"), (21, 10, 3, "error"),
    (30, 0, 4, "view"), (31, 30, 4, "click"), (32, 60, 4, "error"),
]
STEPS = ["view", "click", "error"]
MAXSPAN = 60 * 60  # 60 minutes in seconds


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [(eid, _ts(m), uid, ty, 0.0, "{}") for eid, m, uid, ty in EVENTS]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def _sorted_events():
    return sorted(EVENTS, key=lambda e: (e[2], _ts(e[1]), e[0]))


def _brute_all(maxspan_s):
    """Naive minimal-chain enumeration with linear scans."""
    out = []
    by_user: dict[int, list] = {}
    for eid, m, uid, ty in EVENTS:
        by_user.setdefault(uid, []).append((_ts(m), eid, ty))
    for uid, evs in sorted(by_user.items()):
        evs.sort()
        for i, (t, eid, ty) in enumerate(evs):
            if ty != STEPS[0]:
                continue
            chain = [(t, eid)]
            pos = i
            ok = True
            for step in STEPS[1:]:
                nxt = None
                for j in range(pos + 1, len(evs)):
                    if evs[j][2] == step:
                        nxt = j
                        break
                if nxt is None:
                    ok = False
                    break
                chain.append((evs[nxt][0], evs[nxt][1]))
                pos = nxt
            if ok and (chain[-1][0] - chain[0][0]).total_seconds() \
                    <= maxspan_s:
                out.append((uid, *[x for p in chain for x in p]))
    return sorted(out)


def _brute_skip(maxspan_s):
    """Naive greedy non-overlap: repeatedly take the earliest-starting
    valid chain strictly after the previous match's last event."""
    all_chains = _brute_all(maxspan_s)
    out = []
    last: dict[int, tuple] = {}
    for row in all_chains:  # already sorted by (uid, t1, id1)
        uid = row[0]
        chain = [(row[1], row[2]), (row[3], row[4]), (row[5], row[6])]
        cur = last.get(uid)
        if cur is not None and any(p <= cur for p in chain):
            continue
        out.append(row)
        last[uid] = chain[-1]
    return sorted(out)


def test_sequence_all_matches_bruteforce(events_df):
    got = sorted(
        (r["user_id"], r["t1"], r["id1"], r["t2"], r["id2"],
         r["t3"], r["id3"])
        for r in sequence(events_df, STEPS, maxspan_s=MAXSPAN).collect())
    assert got == _brute_all(MAXSPAN)
    assert got  # non-empty by construction


def test_sequence_all_tie_uses_id_order(events_df):
    """User 2: click id=11 at t=15 ties with error id=12 and click
    id=13 at t=15; 'after' is (ts, id) order, so the chain from view
    id=10 goes 10 -> 11 -> 12 (error at the SAME minute but higher
    id counts as after the click)."""
    rows = [r for r in sequence(events_df, STEPS).collect()
            if r["user_id"] == 2]
    assert [(r["id1"], r["id2"], r["id3"]) for r in rows] == [(10, 11, 12)]


def test_sequence_all_maxspan_cuts(events_df):
    """User 1's second view (id=5, t=30) chains to click t=200 ->
    error t=210: span 180 min > 60 min, excluded; exactly-at-maxspan
    (user 4, span 60 min) is INCLUDED (<=)."""
    got = sequence(events_df, STEPS, maxspan_s=MAXSPAN).collect()
    users = [r["user_id"] for r in got]
    assert 4 in users
    assert all(not (r["user_id"] == 1 and r["id1"] == 5) for r in got)


def test_sequence_skip_matches_bruteforce(events_df):
    got = sorted(
        (r["user_id"], r["t1"], r["id1"], r["t2"], r["id2"],
         r["t3"], r["id3"])
        for r in sequence(events_df, STEPS, maxspan_s=MAXSPAN,
                          overlap="skip").collect())
    want = _brute_skip(MAXSPAN)
    assert got == want
    # non-overlap really removed a chain: user 1's views id=1 and id=2
    # share click id=3 / error id=4 in all-mode
    assert len(got) < len(_brute_all(MAXSPAN))


def test_sequence_two_steps(events_df):
    got = sequence(events_df, ["view", "click"], maxspan_s=MAXSPAN).collect()
    # user 3 has no click at all
    assert all(r["user_id"] != 3 for r in got)
    assert {r["user_id"] for r in got} == {1, 2, 4}


def test_sequence_validates(events_df):
    with pytest.raises(ValueError):
        sequence(events_df, ["view"])
    with pytest.raises(ValueError):
        sequence(events_df, STEPS, overlap="nope")


def test_sequence_until_kills_inflight(spark):
    """`until [cancel]` kills a chain with a cancel strictly between
    its first and last consumed events; a cancel AFTER completion (or
    before the chain starts) leaves it alone. Same rule in both
    overlap modes."""
    rows = [
        # user 1: view click CANCEL error -> killed
        (1, _ts(0), 1, "view"), (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "cancel"), (4, _ts(3), 1, "error"),
        # user 2: view click error cancel -> survives
        (10, _ts(0), 2, "view"), (11, _ts(1), 2, "click"),
        (12, _ts(2), 2, "error"), (13, _ts(3), 2, "cancel"),
        # user 3: cancel view click error -> survives (cancel precedes)
        (20, _ts(0), 3, "cancel"), (21, _ts(1), 3, "view"),
        (22, _ts(2), 3, "click"), (23, _ts(3), 3, "error"),
    ]
    df = spark.createDataFrame(
        [(eid, t, uid, ty, 0.0, "{}") for eid, t, uid, ty in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string")
    for mode in ("all", "skip"):
        got = sequence(df, STEPS, maxspan_s=MAXSPAN, until="cancel",
                       overlap=mode).collect()
        assert sorted(r["user_id"] for r in got) == [2, 3], mode
    with pytest.raises(ValueError):
        sequence(df, STEPS, until="view")


def test_eql_text_syntax(events_df):
    """The EQL text front end parses the sequence/sample subset and
    produces exactly the programmatic calls."""
    from elasticsearch_osmosis_plugin_spark.operators.eql import (
        eql_search,
        sample,
    )

    q = ('sequence by user_id with maxspan=1h '
         '[view] [any where event_type == "click"] [error]')
    got = eql_search(events_df, q).collect()
    want = sequence(events_df, STEPS, maxspan_s=3600).collect()
    assert got == want and got

    q2 = 'sequence by user_id with maxspan=1h [view] [click] until [error]'
    got2 = eql_search(events_df, q2).collect()
    want2 = sequence(events_df, ["view", "click"], maxspan_s=3600,
                     until="error").collect()
    assert got2 == want2

    got3 = eql_search(events_df, "sample by user_id [error] [view]").collect()
    assert got3 == sample(events_df, ["error", "view"]).collect()

    for bad in ("match all", "sequence [view]",
                "sequence by user_id [view] garbage [click]",
                'sequence by user_id [any where props == "x"]',
                "sample by user_id with maxspan=1h [view] [click]"):
        with pytest.raises(ValueError):
            eql_search(events_df, bad)


def test_sample_unordered(events_df):
    """sample ignores order between steps: user 3 has error BEFORE any
    click... (view at 0, error at 10, no click) — with steps
    [error, view] user 3 qualifies even though error follows view; the
    picked events are the per-type earliest."""
    from elasticsearch_osmosis_plugin_spark.operators.eql import sample

    rows = {r["user_id"]: r
            for r in sample(events_df, ["error", "view"]).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[3]["id1"], rows[3]["id2"]) == (21, 20)
    assert (rows[1]["id1"], rows[1]["id2"]) == (4, 1)
    # missing a step drops the key
    from elasticsearch_osmosis_plugin_spark.operators.eql import sample as s2
    got = s2(events_df, ["click", "view"]).collect()
    assert all(r["user_id"] != 3 for r in got)  # user 3 never clicks


def test_funnel_partial_progress(events_df):
    rows = {r["user_id"]: r for r in
            funnel(events_df, STEPS, maxspan_s=MAXSPAN).collect()}
    # user 3: view but never clicks -> steps_reached 1, t2/t3 null
    assert rows[3]["steps_reached"] == 1
    assert rows[3]["t2"] is None and rows[3]["t3"] is None
    assert not rows[3]["converted"]
    # user 1: first view id=1 chains 1->3->4, span 20 min -> converted
    assert (rows[1]["id1"], rows[1]["id2"], rows[1]["id3"]) == (1, 3, 4)
    assert rows[1]["converted"]
    # user 4: completes at exactly maxspan -> converted (<=)
    assert rows[4]["converted"]
    # one row per key with a step-0 event
    assert set(rows) == {1, 2, 3, 4}


def test_funnel_maxspan_flags_not_filters(events_df):
    """A chain outside maxspan keeps its timestamps; only `converted`
    flips."""
    rows = {r["user_id"]: r for r in
            funnel(events_df, STEPS, maxspan_s=1).collect()}
    assert rows[1]["steps_reached"] == 3
    assert not rows[1]["converted"]


def test_eql_with_runs_repetition(spark):
    """`[x] with runs=N` (ES 8.4): the step must match N consecutive
    times — sugar expanded into the plain step list."""
    from elasticsearch_osmosis_plugin_spark.operators.eql import (
        eql_search,
        sequence,
    )

    rows = [(1, i, t, f"2024-01-01 00:0{i}:00") for i, t in
            enumerate(["view", "view", "view", "click"])] + \
           [(2, i + 10, t, f"2024-01-01 00:0{i}:00") for i, t in
            enumerate(["view", "click"])]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string") \
        .selectExpr("user_id", "event_id", "event_type",
                    "to_timestamp(ts) AS ts")
    got = eql_search(ev, 'sequence by user_id [view] with runs=3 [click]')
    want = sequence(ev, ["view", "view", "view", "click"], by="user_id")
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted(tuple(r) for r in want.collect())
    # only user 1 has three views before a click
    assert {r["user_id"] for r in got.collect()} == {1}
    import pytest as _pt
    with _pt.raises(ValueError, match="runs"):
        eql_search(ev, 'sequence by user_id [view] with runs=0 [click]')
