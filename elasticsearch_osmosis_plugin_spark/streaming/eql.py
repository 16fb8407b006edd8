"""Streaming EQL: greedy non-overlapping sequence matching over a
Structured Streaming event source (the CEP role Flink fills with
MATCH_RECOGNIZE / CEP — here as an ``applyInPandasWithState``
operator, the engine's standard custom-stateful construct).

Exactly the batch ``operators.eql.sequence(overlap="skip")`` semantics
— greedy leftmost-earliest non-overlapping chains under the (ts, tie)
total order — made incremental with a WATERMARK-FINALITY rule:

- an in-flight step-0 candidate is ALIVE while ``first.ts + maxspan >=
  watermark`` (a completing event could still arrive);
- emission stops at the first alive candidate — everything emitted is
  final because all of its events lie below the watermark, where the
  event set is complete, so links (earliest-next choices) can never be
  preempted by a late arrival;
- a candidate whose maxspan window has fully passed the watermark
  without completing is DEAD and skipped, exactly like batch greedy
  skipping a failed chain.

Stream == batch: per key, the concatenated emissions equal the batch
matcher's output over the same events restricted to ts below the final
watermark (verified in tests/test_multimodal_streaming.py).

Scale: state per key is the event buffer of ONE maxspan window
(everything below ``watermark - maxspan`` is consumable only by dead
or already-emitted candidates, so it is pruned every call) plus the
consumption cursor — bounded by event rate x maxspan, independent of
stream length.
"""
from __future__ import annotations

import bisect
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_stream(events: DataFrame, steps: Sequence[str], *,
                    by: str = "user_id", ts_col: str = "ts",
                    tie_col: str = "event_id",
                    type_col: str = "event_type",
                    maxspan_s: float = 3600.0,
                    watermark: str = "2 hours") -> DataFrame:
    """Greedy non-overlapping EQL ``sequence by <key> [s0] [s1] ...
    with maxspan`` over a streaming DataFrame; emits one APPEND row per
    completed match: (key, t1..tk timestamps, id1..idk), each emitted
    exactly once, as soon as the watermark proves it final."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(steps)
    if k < 2:
        raise ValueError("sequence needs >=2 steps")
    step_idx = {s: i for i, s in enumerate(steps)}
    maxspan_us = int(float(maxspan_s) * 1e6)
    maxspan_ms = int(float(maxspan_s) * 1e3)

    ev = (events
          .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
          .filter(F.col(type_col).isin(list(steps)))
          .withWatermark(ts_col, watermark))

    out_schema = (f"`{by}` long, "
                  + ", ".join(f"t{i} timestamp, id{i} long"
                              for i in range(1, k + 1)))
    state_schema = ("ts_us array<long>, tie array<long>, "
                    "step array<int>, cur_ts long, cur_tie long")
    out_cols = [by] + [c for i in range(1, k + 1)
                       for c in (f"t{i}", f"id{i}")]

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (key_val,) = key
        buf: list[tuple[int, int, int]] = []  # (ts_us, tie, step)
        cur = None
        if state.exists:
            ts_us, tie, stp, cur_ts, cur_tie = state.get
            buf = list(zip(ts_us, tie, stp))
            if cur_ts is not None and cur_ts >= 0:
                cur = (cur_ts, cur_tie)
        for pdf in pdfs:
            buf.extend(
                (int(t.value // 1000), int(i), step_idx[y])
                for t, i, y in zip(pdf[ts_col], pdf[tie_col], pdf[type_col]))
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000

        # greedy emission over the watermark-final prefix
        per: list[list[tuple[int, int]]] = [[] for _ in range(k)]
        for t, i, s in buf:
            if cur is None or (t, i) > cur:
                per[s].append((t, i))
        rows = []
        for first in per[0]:
            if cur is not None and first <= cur:
                continue
            if first[0] + maxspan_us >= wm_us:
                break  # still alive: a completing event may yet arrive
            chain, prev, ok = [first], first, True
            for s in range(1, k):
                j = bisect.bisect_right(per[s], prev)
                if j >= len(per[s]):
                    ok = False
                    break
                prev = per[s][j]
                chain.append(prev)
            if ok and chain[-1][0] - chain[0][0] <= maxspan_us:
                row = [key_val]
                for t, i in chain:
                    row += [pd.Timestamp(t * 1000), i]
                rows.append(row)
                cur = chain[-1]
            # else: dead candidate — skipped, cursor unchanged

        # prune: below the cursor is consumed; below wm - maxspan only
        # dead/emitted candidates could consume it
        keep = [(t, i, s) for t, i, s in buf
                if (cur is None or (t, i) > cur)
                and t >= wm_us - maxspan_us]
        if keep:
            alive0 = next((t for t, _i, s in keep if s == 0), None)
            base_us = alive0 if alive0 is not None else keep[-1][0]
            state.update(([t for t, _, _ in keep],
                          [i for _, i, _ in keep],
                          [s for _, _, s in keep],
                          cur[0] if cur else -1,
                          cur[1] if cur else -1))
            state.setTimeoutTimestamp(
                max(base_us // 1000 + maxspan_ms + 1,
                    state.getCurrentWatermarkMs() + 1))
        elif cur is not None:
            # nothing buffered but the cursor must survive until the
            # watermark passes it (a pre-cursor late straggler could
            # otherwise be re-consumed); keep a tombstone state
            if cur[0] >= wm_us - maxspan_us:
                state.update(([], [], [], cur[0], cur[1]))
                state.setTimeoutTimestamp(
                    max(cur[0] // 1000 + maxspan_ms + 1,
                        state.getCurrentWatermarkMs() + 1))
            else:
                state.remove()
        elif state.exists:
            state.remove()
        yield pd.DataFrame(rows, columns=out_cols)

    return ev.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)
