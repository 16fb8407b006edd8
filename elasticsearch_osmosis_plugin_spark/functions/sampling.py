"""Deterministic sampling / mixture weighting for training-data
pipelines.

Random sampling (``df.sample``) is the wrong tool for dataset
curation at 100 TB: reruns must reproduce the same corpus bit-for-bit
(lineage, decontamination audits, ablations), and per-partition RNG
streams change whenever the partitioning does. Everything here is a
pure FILTER on a content-independent hash of the row key — no
shuffle, no state, stable under any repartitioning, and the DuckDB
oracle reproduces it value-for-value.

Hash: md5 of ``"<id>:<seed>"`` folded to 60 bits (the same
cross-engine md5 trick the dedup suite uses — identical in Spark,
DuckDB, and Python). A row is kept iff ``hash % 1_000_000 <
rate * 1e6``, so nested rates compose (a 0.5 sample of a 0.5 sample
at the same seed is the 0.5 sample, and disjoint seeds decorrelate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DENOM = 1_000_000


def sample_key(id_col: str = "doc_id", seed: int = 0) -> Column:
    """60-bit md5 fold of "<id>:<seed>" -> [0, 1e6) bucket."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(seed)))), 2, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(_DENOM))


def deterministic_sample(df: DataFrame, rate: float, *,
                         id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash.
    Pure narrow filter — survives any repartitioning, reruns exactly."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(sample_key(id_col, seed) < int(rate * _DENOM))


def stratified_mixture(df: DataFrame, rates: dict[str, float], *,
                       stratum_col: str, id_col: str = "doc_id",
                       seed: int = 0,
                       default_rate: float = 0.0) -> DataFrame:
    """Mixture weighting: per-stratum deterministic sampling rates
    (e.g. upweight code, downweight boilerplate sources). Strata
    absent from ``rates`` get ``default_rate``. One CASE expression +
    one filter — map-side only, no shuffle, skew-immune."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    thr = F.lit(int(default_rate * _DENOM))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == s,
                     F.lit(int(r * _DENOM))).otherwise(thr)
    return df.filter(sample_key(id_col, seed) < thr)


def split_column(id_col: str = "doc_id", *, eval_frac: float = 0.1,
                 seed: int = 0) -> Column:
    """'train' / 'eval' assignment column, deterministic by key hash.
    The eval set is stable across reruns and independent of row order
    — the property decontamination audits require."""
    return F.when(sample_key(id_col, seed) < int(eval_frac * _DENOM),
                  F.lit("eval")).otherwise(F.lit("train"))


def train_eval_split(df: DataFrame, *, eval_frac: float = 0.1,
                     id_col: str = "doc_id",
                     seed: int = 0) -> tuple[DataFrame, DataFrame]:
    """(train_df, eval_df) — disjoint, exhaustive, deterministic."""
    key = sample_key(id_col, seed)
    cut = int(eval_frac * _DENOM)
    return df.filter(key >= cut), df.filter(key < cut)


def pack_sequences(df: DataFrame, budget: int, *,
                   id_col: str = "doc_id",
                   n_tokens_col: str = "n_tokens") -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out in
    deterministic ``id_col`` order and cut it into fixed token-budget
    bins -> (doc_id, n_tokens, bin_id, offset) where ``offset`` is the
    doc's start position in the global token stream and
    ``bin_id = offset // budget``. A doc whose tokens straddle a
    boundary belongs to the bin it STARTS in (standard
    pack-then-chunk; downstream chunking splits it) — total per-bin
    tokens exceed ``budget`` by at most one document.

    This exact-global-order variant needs one window cumsum over the
    full ordering — fine up to ~10^9 rows but serialized through a
    single-partition window at the extreme; use
    :func:`pack_sequences_partitioned` at 100 TB."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window

    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.col(n_tokens_col).cast("long").alias("n_tokens"))
            .withColumn("offset",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .withColumn("bin_id", (F.col("offset") / budget).cast("long"))
            .select("doc_id", "n_tokens", "bin_id", "offset"))


def pack_sequences_partitioned(df: DataFrame, budget: int, *,
                               id_col: str = "doc_id",
                               n_tokens_col: str = "n_tokens") -> DataFrame:
    """Scale path: pack each Spark partition independently (bin ids
    are (partition, local_bin) pairs encoded as pid * 2^40 + local).
    No global order, no single-partition window, no shuffle at all —
    each task streams its rows once. Bins never span partitions, so
    at most one under-filled bin per partition (negligible waste when
    partitions hold >> budget tokens)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    import pandas as pd

    out_schema = "doc_id long, n_tokens long, bin_id long, offset long"

    def pack(pdf_iter):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        cum = 0
        for pdf in pdf_iter:
            n = pdf[n_tokens_col].astype("int64")
            offs = n.cumsum().shift(fill_value=0) + cum
            cum += int(n.sum())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_tokens": n,
                "bin_id": (pid << 40) + (offs // budget),
                "offset": offs,
            })

    return df.select(id_col, n_tokens_col).mapInPandas(pack, out_schema)


def temperature_rates(sizes: dict[str, int], alpha: float = 0.3,
                      budget: float | None = None) -> dict[str, float]:
    """Temperature-scaled mixture rates (the multilingual-LM alpha
    sampling rule: target share of stratum i ~ p_i^alpha with
    p_i = n_i / N). Returns per-stratum KEEP RATES for
    :func:`stratified_mixture` that realize the alpha-scaled target
    mixture from the observed sizes.

    rate_i = c * p_i^(alpha-1), c chosen so max rate == 1.0 (nothing
    upsampled past its data — ES of duplication is out of scope for a
    keep-rate sampler), or scaled down further to hit ``budget``
    (target total kept fraction of N, when feasible).

    alpha=1 keeps everything equally (natural mixture); alpha=0 aims
    at a uniform mixture across strata (small strata fully kept, big
    ones cut). Plain driver-side arithmetic — the heavy lifting stays
    in the map-side md5 filter."""
    if not sizes:
        return {}
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    n = float(sum(sizes.values()))
    if n <= 0:
        return {s: 0.0 for s in sizes}
    raw = {s: (k / n) ** (alpha - 1.0) if k > 0 else 0.0
           for s, k in sizes.items()}
    top = max(raw.values())
    rates = {s: v / top for s, v in raw.items()}
    if budget is not None:
        kept = sum(rates[s] * k for s, k in sizes.items()) / n
        if kept > budget > 0:
            scale = budget / kept
            rates = {s: v * scale for s, v in rates.items()}
    return rates


def temperature_mixture(df: DataFrame, *, stratum_col: str,
                        alpha: float = 0.3, budget: float | None = None,
                        id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Alpha-sampled mixture in two passes: ONE count-by-stratum agg
    (map-side combined) to observe sizes, then the deterministic
    keep-rate filter of :func:`stratified_mixture`. Reproducible under
    any partitioning; strata never shuffle."""
    sizes = {r[0]: r[1] for r in
             df.groupBy(stratum_col).count().collect()}
    rates = temperature_rates(sizes, alpha=alpha, budget=budget)
    return stratified_mixture(df, rates, stratum_col=stratum_col,
                              id_col=id_col, seed=seed)
