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


def md5_uniform(col: Column) -> Column:
    """Deterministic uniform [0, 1) from a column's md5 (60-bit fold)
    — the ONE shared Bernoulli draw (ES|QL SAMPLE, per-row sampling)
    so the determinism contract lives in one place."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 2, 15), 16, 10)
    return h.cast("double") / F.lit(float(16 ** 15))


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
                        id_col: str = "doc_id", seed: int = 0,
                        weight_col: str | None = None) -> DataFrame:
    """Alpha-sampled mixture in two passes: ONE count-by-stratum agg
    (map-side combined) to observe sizes, then the deterministic
    keep-rate filter of :func:`stratified_mixture`. Reproducible under
    any partitioning; strata never shuffle.

    ``weight_col`` switches the stratum size from doc COUNT to the
    column's SUM — the token-budget form LM data mixes actually use
    (a stratum of few huge documents is as big as one of many small
    ones); the keep decision stays per-doc, so expected kept TOKENS
    per stratum hit the alpha-scaled token shares."""
    sizes_agg = (F.sum(F.col(weight_col).cast("double")) if weight_col
                 else F.count(F.lit(1)).cast("double"))
    sizes = {r[0]: r[1] for r in
             df.groupBy(stratum_col).agg(sizes_agg.alias("n")).collect()}
    rates = temperature_rates(sizes, alpha=alpha, budget=budget)
    return stratified_mixture(df, rates, stratum_col=stratum_col,
                              id_col=id_col, seed=seed)


# ---------------------------------------------------------------- DSIR

def _gram_bucket(g: Column, n_buckets: int) -> Column:
    """Hashed n-gram feature index: the 60-bit md5 fold mod B (the
    cross-engine hash trick — identical in Spark, DuckDB, Python)."""
    h = F.conv(F.substring(F.md5(g), 2, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def _grams_col(text_col: str, bigrams: bool) -> Column:
    """Hashed-feature gram list: unigrams (simple-analyzer tokens),
    optionally followed by space-joined bigrams — list ORDER is part
    of the contract (the per-doc weight folds in this order, so the
    DuckDB twin reproduces sums bit-for-bit)."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import tokens_col

    toks = tokens_col(text_col)
    if not bigrams:
        return toks
    # slice length must be exact (start+INT_MAX overflows to NULL);
    # concat (not concat_ws) propagates the null past-the-end pad, so
    # the trailing non-bigram filters out with isNotNull
    bi = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1,
                                                     F.lit(0))),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull())
    return F.concat(toks, bi)


def dsir_log_weights(raw: DataFrame, target: DataFrame, *,
                     n_buckets: int = 256, id_col: str = "doc_id",
                     text_col: str = "text",
                     bigrams: bool = True) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, *Data Selection
    for Language Models via Importance Resampling*): score every raw
    doc by how much its hashed n-gram feature distribution looks like
    the TARGET corpus rather than the RAW corpus.

    Features: unigrams + bigrams hashed into ``n_buckets`` buckets.
    Bucket unigram LMs with Laplace smoothing:
    p[b] = (ct_target[b]+1)/(T_target+B), q[b] likewise over raw;
    log w(x) = sum over x's gram occurrences of ln(p[b]) - ln(q[b]).

    Plan (100 TB shape): TWO count aggregations (explode -> groupBy
    bucket, map-side combined, B rows each) train the models; the
    per-doc weight is then a PURE MAP — the B-sized log-ratio table is
    folded into the plan as an array literal and each doc reduces
    ``aggregate(transform(grams, g -> lr[bucket(g)]))`` with no join,
    no shuffle, no UDF. The fold is sequential in gram order, so the
    DuckDB twin reproduces scores bit-for-bit.

    Returns raw ``(id_col, logw)``."""
    grams = _grams_col(text_col, bigrams)

    def counts(df: DataFrame) -> tuple[list[float], float]:
        rows = (df.select(F.explode(grams).alias("g"))
                .select(_gram_bucket(F.col("g"), n_buckets).alias("b"))
                .groupBy("b").count().collect())
        ct = [0.0] * n_buckets
        for r in rows:
            ct[int(r["b"])] = float(r["count"])
        return ct, sum(ct)

    ct_t, tot_t = counts(target)
    ct_r, tot_r = counts(raw)
    if tot_t <= 0 or tot_r <= 0:
        raise ValueError("dsir_log_weights: empty target or raw corpus")
    import math

    lr = [math.log((ct_t[b] + 1.0) / (tot_t + n_buckets))
          - math.log((ct_r[b] + 1.0) / (tot_r + n_buckets))
          for b in range(n_buckets)]
    lr_arr = F.array(*[F.lit(v) for v in lr])
    logw = F.aggregate(
        F.transform(grams,
                    lambda g: F.element_at(lr_arr, _gram_bucket(g, n_buckets)
                                           .cast("int") + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    return raw.select(F.col(id_col), logw.alias("logw"))


def dsir_sample(raw: DataFrame, target: DataFrame, k: int, *,
                n_buckets: int = 256, id_col: str = "doc_id",
                text_col: str = "text", bigrams: bool = True,
                seed: int = 0) -> DataFrame:
    """DSIR selection: Gumbel top-k resampling without replacement —
    keep the k raw docs with the largest ``logw + Gumbel(u)`` where
    ``u`` is the deterministic md5 uniform of (id, seed) (so the draw
    is reproducible under any partitioning, like every sampler here).

    Returns ``(id_col, logw, key)`` ordered by key desc, id asc — the
    standard Gumbel-max equivalence to sampling proportional to w(x)
    without replacement."""
    w = dsir_log_weights(raw, target, n_buckets=n_buckets, id_col=id_col,
                         text_col=text_col, bigrams=bigrams)
    u = (sample_key(id_col, seed).cast("double") + 0.5) / float(_DENOM)
    key = F.col("logw") - F.log(-F.log(u))
    return (w.withColumn("key", key)
            .orderBy(F.desc("key"), F.asc(id_col)).limit(int(k)))


def shuffle_order(df: DataFrame, *, id_col: str = "doc_id",
                  seed: int = 0) -> DataFrame:
    """Reproducible global shuffle for training order: adds
    ``shuffle_pos`` (0-based epoch position) by sorting on the 60-bit
    md5 fold of (id, seed) with id as the tiebreak — the standard
    "hash-ordered epoch" an LLM data pipeline uses so every rerun,
    resume, and worker sees the SAME example order. A new seed is a
    new independent permutation.

    Scale note: epoch ordering is inherently a global sort, but a
    range-partitioned sort on a 60-bit key is exactly what Spark's
    sort-shuffle is built for; for sharded output prefer writing with
    ``repartitionByRange(shuffle_key)`` + ``sortWithinPartitions`` and
    let consumers read shards in order — same permutation, no single
    global sort barrier."""
    from pyspark.sql import Window as W

    key = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(f"shuf{seed}"),
                          F.col(id_col).cast("string"))), 2, 15),
        16, 10).cast("long")
    w = W.orderBy(F.col("_shuffle_key"), F.col(id_col))
    return (df.withColumn("_shuffle_key", key)
            .withColumn("shuffle_pos",
                        (F.row_number().over(w) - 1).cast("long"))
            .drop("_shuffle_key"))
