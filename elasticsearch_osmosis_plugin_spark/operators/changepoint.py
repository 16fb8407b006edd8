"""Change-point detection: the ES `change_point` aggregation / ES|QL
``CHANGE_POINT`` command analog.

Elasticsearch's detector lives in ml-cpp (C++ decision forest of
hypothesis tests); this is a from-scratch deterministic analog exposing
the same API shape — same command syntax, same output columns
(``type`` + ``pvalue``, annotated at the detected row), same bounded
input contract (ES evaluates at most 1000 points and requires >= 22)
— with a documented, reproducible test battery instead of numeric
parity with ml-cpp.

Detector (all closed-form, no RNG):

1. **spike / dip** — robust leave-out z-score: deviation from the
   median scaled by MAD·1.4826. A single dominant point (max z >= 6
   and at least twice the runner-up) is a spike (above) or dip
   (below). p-value = normal tail erfc(z/√2).
2. **step_change** — best two-segment split by Welch t-statistic over
   all splits with >= 5 points per side; significant when t >= 5.
3. **trend_change** — if no step wins, the split maximizing the
   difference of per-segment linear slopes, each slope scored by its
   own t-statistic; significant when the slope-difference t >= 5.
4. otherwise **stationary** (or **indeterminable** with < 22 points,
   matching ES's minimum-data rule).

Scale notes: the per-series kernel is O(n) with n <= 1000 by the same
truncation rule ES applies, so each series is one small Arrow batch.
The grouped operator fans series out with ``applyInPandas`` — one
shuffle by the group key, kernels run in parallel across executors;
the global (ES|QL command) form is a single bounded batch by
construction.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_POINTS = 1000          # ES: change_point evaluates at most 1000
MIN_POINTS = 22            # ES: requires at least 22 points
_Z_SPIKE = 6.0             # dominant-point threshold (robust z)
_T_STEP = 5.0              # Welch t threshold for a step
_T_TREND = 5.0             # slope-difference t threshold


def _norm_sf(z: float) -> float:
    """Standard-normal survival function (one-sided p-value)."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _welch_t(a: np.ndarray, b: np.ndarray) -> float:
    va = a.var(ddof=1) if len(a) > 1 else 0.0
    vb = b.var(ddof=1) if len(b) > 1 else 0.0
    denom = math.sqrt(va / len(a) + vb / len(b)) or 1e-12
    return abs(float(a.mean() - b.mean())) / denom


def _slope_t(y: np.ndarray) -> tuple[float, float]:
    """(slope, t-stat of slope) of the least-squares line y ~ idx."""
    n = len(y)
    x = np.arange(n, dtype=float)
    sxx = ((x - x.mean()) ** 2).sum()
    if sxx == 0 or n < 3:
        return 0.0, 0.0
    slope = float(((x - x.mean()) * (y - y.mean())).sum() / sxx)
    resid = y - (y.mean() + slope * (x - x.mean()))
    s2 = float((resid ** 2).sum() / (n - 2)) or 1e-24
    return slope, abs(slope) / math.sqrt(s2 / sxx)


def detect_series(values) -> tuple[str, float, int | None]:
    """-> (type, p_value, index-of-change or None). Deterministic."""
    v = np.asarray(values, dtype=float)
    v = v[np.isfinite(v)][:MAX_POINTS]
    n = len(v)
    if n < MIN_POINTS:
        return "indeterminable", 1.0, None

    # 1. spike / dip — one dominant robust outlier
    med = float(np.median(v))
    mad = float(np.median(np.abs(v - med))) * 1.4826
    scale = mad if mad > 0 else (float(v.std(ddof=1)) or 1e-12)
    z = np.abs(v - med) / scale
    i_star = int(z.argmax())
    z1 = float(z[i_star])
    z2 = float(np.partition(z, -2)[-2]) if n > 1 else 0.0
    if z1 >= _Z_SPIKE and z1 >= 2.0 * max(z2, 1e-12):
        kind = "spike" if v[i_star] > med else "dip"
        return kind, max(_norm_sf(z1), 1e-300), i_star

    # 2. trend change — split maximizing the slope difference with both
    #    segments' slopes individually significant (a flat→flat step
    #    fails the min-t guard, so this fires only on genuine ramps;
    #    checked BEFORE step because a ramp also produces a large but
    #    misplaced Welch split)
    best_t, best_s = 0.0, None
    for s in range(8, n - 7):
        sl1, t1 = _slope_t(v[:s])
        sl2, t2 = _slope_t(v[s:])
        gap = abs(sl1 - sl2) * math.sqrt(min(s, n - s))
        score = gap / (abs(sl1) + abs(sl2) + 1e-12) * min(t1 + t2, 50.0)
        if min(t1, t2) >= 2.0 and gap > 1e-9 and score > best_t:
            best_t, best_s = score, s
    if best_s is not None and best_t >= _T_TREND:
        return "trend_change", max(_norm_sf(best_t), 1e-300), best_s

    # 3. step change — best Welch split (>=5 points per side)
    best_t, best_s = 0.0, None
    for s in range(5, n - 4):
        t = _welch_t(v[:s], v[s:])
        if t > best_t:
            best_t, best_s = t, s
    if best_s is not None and best_t >= _T_STEP:
        return "step_change", max(_norm_sf(best_t), 1e-300), best_s

    return "stationary", 1.0, None


def change_point(df: DataFrame, value_col: str, key_col: str,
                 by: list[str] | None = None,
                 type_col: str = "type",
                 pvalue_col: str = "pvalue") -> DataFrame:
    """Annotate each (group's) series with change-point columns.

    Rows come back with ``type_col``/``pvalue_col`` set ONLY at the
    detected row (ES|QL CHANGE_POINT row-annotation shape); order and
    all input columns preserved. ``by=[]``/None treats the whole frame
    as one series (the ES|QL command) and, like ES, evaluates AND
    returns only the first ``MAX_POINTS`` rows in key order; a
    non-empty ``by`` fans out one kernel per group (the
    change_point-agg shape — group size is the caller's contract).
    """
    by = by or []
    schema_cols = df.schema.fields
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in schema_cols]
        + [f"`{type_col}` string", f"`{pvalue_col}` double"])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort") \
            .reset_index(drop=True)
        head = pdf.iloc[:MAX_POINTS]
        kind, p, idx = detect_series(head[value_col].to_numpy())
        pdf[type_col] = None
        pdf[pvalue_col] = np.nan
        if idx is not None:
            pdf.loc[idx, type_col] = kind
            pdf.loc[idx, pvalue_col] = p
        elif kind != "stationary" and len(pdf):
            # indeterminable: ES reports it on the first row
            pdf.loc[0, type_col] = kind
            pdf.loc[0, pvalue_col] = 1.0
        return pdf

    if by:
        # group size is the caller's contract (ES evaluates <= 1000
        # points per series; the kernel truncates detection the same
        # way but returns every row of its group)
        return df.groupBy(*by).applyInPandas(kernel, out_schema)
    # global (ES|QL command) form: bound the frame BEFORE the shuffle —
    # TakeOrdered(MAX_POINTS) by the key column, matching ES's
    # first-1000-values rule — so the single kernel task holds at most
    # MAX_POINTS rows instead of materializing the whole input
    head = df.orderBy(key_col).limit(MAX_POINTS)
    one = head.withColumn("__g", F.lit(1))
    return (one.groupBy("__g").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns="__g")), out_schema))
