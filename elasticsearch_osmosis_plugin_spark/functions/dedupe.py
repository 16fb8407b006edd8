"""Deduplication operators for training-data pipelines.

Five families, each a first-class ``queries()`` entry:
- exact:        hash-groupBy on a normalized fingerprint
- n-gram Jaccard: exact pairwise similarity via a shared-shingle join
- MinHash:      k independent md5-salted min-hashes over shingles
- MinHash+LSH:  banded signatures -> bucket join -> candidate pairs
- SimHash:      64-bit weighted bit-majority fingerprint (numpy kernel)
- embedding:    cosine near-dup pairs (exact; LSH scale path in
                functions.similarity)

Hash choice is md5 everywhere: identical across Spark, DuckDB and
Python — never the process-salted builtin hash(). All set/pair math is
DataFrame-native; only SimHash needs a vectorized numpy kernel.

Scale notes: the shared-shingle join is the classic near-dup plan —
its skew risk is hot shingles; ``max_shingle_df`` drops shingles seen
in more than that many docs (logged via the returned stats, never
silent) exactly like stop-term sharding in the index build.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from elasticsearch_osmosis_plugin_spark.functions.analysis import tokens_col


def _materialized(result: DataFrame, released: list[DataFrame]) -> DataFrame:
    """Run the pair computation NOW (localCheckpoint), then free the
    corpus-sized cached intermediates. Near-dup pair sets are tiny
    relative to the relations that produce them, so eager
    materialization costs nothing while guaranteeing a long-lived
    session never accumulates per-call cache entries (the CacheManager
    keeps plan-keyed entries until an explicit unpersist)."""
    out = result.localCheckpoint(eager=True)
    for df in released:
        df.unpersist()
    return out


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: fingerprint,
    group size, representative (min) doc id."""
    norm = F.concat_ws(" ", tokens_col(text_col))
    return (df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct token-level n-gram shingles per doc: (doc_id, shingle)."""
    # materialize the token array behind a projection boundary FIRST:
    # referencing the tokenize expression inside the transform() lambda
    # makes Catalyst re-evaluate the regex split once PER GRAM (O(T^2)
    # regex work per doc — measured 6x slower at sf0.1); bound to a
    # column it runs once per row
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    k = F.size(toks) - (n - 1)
    # guard: F.sequence(1, k) DESCENDS for k < 1 — emit no shingles instead
    grams = F.when(k >= 1, F.array_distinct(F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))) \
        .otherwise(F.array().cast("array<string>"))
    return base.select("doc_id", F.explode(grams).alias("shingle"))


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int | None = None,
                        hash_shingles: bool = False) -> DataFrame:
    """Exact Jaccard over distinct n-gram shingle sets for every pair
    sharing >=1 shingle. |A∩B| from the shared-shingle self-join;
    |A∪B| = |A|+|B|-|A∩B|.

    ``hash_shingles=True`` is the scale path: the self-join keys on a
    60-bit md5 fold of each shingle instead of the shingle string —
    ~8x fewer shuffle bytes at a ~2^-60 per-pair collision risk (the
    default stays byte-exact for the correctness oracle)."""
    sh = shingles(df, n, id_col, text_col)
    if hash_shingles:
        sh = sh.select("doc_id", F.conv(
            F.substring(F.md5("shingle"), 2, 15), 16, 10)
            .cast("long").alias("shingle"))
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
                 .filter(F.col("sdf") > max_shingle_df))
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .filter(jac >= threshold)  # raw ratio: same ints -> same double
            .select("doc_a", "doc_b", x1e4(jac).alias("jaccard_x1e4")))


def ngram_jaccard_pairs_prefix(df: DataFrame, n: int = 3,
                               threshold: float = 0.5,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               max_shingle_df: int | None = None,
                               hash_shingles: bool = False) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (Chaudhuri et al.
    SSJoin / Vernica et al. MapReduce set-similarity join): under any
    global shingle order, two sets with J >= t MUST share a shingle
    inside their prefixes of length |S| - ceil(t*|S|) + 1 — so only
    prefix shingles (rarest-first order makes them the most selective
    ones) become join keys, cutting candidate pairs by orders of
    magnitude vs joining on every shared shingle. Candidates are then
    verified exactly with array_intersect on the full shingle sets.

    Returns exactly the same rows as ``ngram_jaccard_pairs`` (same
    DuckDB oracle); the difference is the plan: one extra corpus
    shuffle to rank shingles per doc, in exchange for a candidate join
    that no longer enumerates every co-occurring pair."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    sh = shingles(df, n, id_col, text_col)
    if hash_shingles:
        # same 60-bit md5 fold + collision trade as ngram_jaccard_pairs:
        # shuffles, rank keys and the verification arrays all shrink
        sh = sh.select("doc_id", F.conv(
            F.substring(F.md5("shingle"), 2, 15), 16, 10)
            .cast("long").alias("shingle"))
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
               .filter(F.col("sdf") > max_shingle_df))
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    # materialize the shingle relation once: the frequency agg and the
    # set-building agg would each re-run shingle+hash generation
    sh = sh.persist()
    sh.count()
    sdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    # ONE groupBy builds the per-doc shingle array in global
    # (rarest-first) order — it serves as BOTH the prefix source and
    # the verification set (no window functions, no second agg)
    sets = (sh.join(sdf, "shingle")
            .groupBy("doc_id")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("sdf", "shingle"))),
                lambda x: x["shingle"]).alias("set")))
    sets = sets.withColumn("sz", F.size("set")).persist()
    sets.count()
    sh.unpersist()
    # prefix length: |S| - ceil(t*|S|) + 1; positions ride along for
    # the PPJoin positional filter below
    plen = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = sets.select(
        "doc_id", "sz",
        F.posexplode(F.slice("set", 1, plen)).alias("pos", "shingle"))
    # positional filter (PPJoin): at the FIRST shared prefix key the
    # overlap is bounded by 1 + min(remaining suffixes) = min(sz - pos)
    # (0-based pos); Jaccard >= t needs overlap >= t(szA+szB)/(1+t).
    # max-over-keys of the bound >= the first-key bound, so filtering
    # on it never drops a true pair; it kills the near-threshold
    # collisions that dominate the verify join.
    alpha = (F.lit(threshold) * (F.col("sz_a") + F.col("sz_b"))
             / F.lit(1.0 + threshold) - F.lit(1e-9))
    bound = F.least(F.col("a.sz") - F.col("a.pos"),
                    F.col("b.sz") - F.col("b.pos"))
    # length filter (the standard SSJoin prefilter): J >= t forces
    # t*|A| <= |B| <= |A|/t (|A∩B| <= min, |A∪B| >= max), so the size
    # ratio check sits IN the join predicate and kills mismatched-size
    # collisions at enumeration time, before they ever reach the
    # groupBy. The 1e-9 slack keeps exact-boundary pairs (t*sz can
    # round up a hair in binary) — conservative, never drops a true
    # pair.
    lenok = ((F.col("b.sz")
              >= F.lit(threshold) * F.col("a.sz") - F.lit(1e-9))
             & (F.col("a.sz")
                >= F.lit(threshold) * F.col("b.sz") - F.lit(1e-9)))
    cands = (prefix.alias("a").join(
                 prefix.alias("b"),
                 (F.col("a.shingle") == F.col("b.shingle"))
                 & (F.col("a.doc_id") < F.col("b.doc_id"))
                 & lenok)
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"),
                      F.col("a.sz").alias("sz_a"),
                      F.col("b.sz").alias("sz_b"))
             .agg(F.max(bound).alias("ubound"))
             .filter(F.col("ubound") >= alpha)
             .select("doc_a", "doc_b"))
    a = sets.select(F.col("doc_id").alias("doc_a"),
                    F.col("set").alias("set_a"), F.col("sz").alias("sz_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"),
                    F.col("set").alias("set_b"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    out = (cands.join(a, "doc_a").join(b, "doc_b")
           .withColumn("inter", inter)
           .filter(F.col("inter") / (F.col("sz_a") + F.col("sz_b")
                                     - F.col("inter")) >= threshold)
           .select("doc_a", "doc_b",
                   x1e4(F.col("inter") / (F.col("sz_a") + F.col("sz_b")
                                          - F.col("inter")))
                   .alias("jaccard_x1e4")))
    return _materialized(out, [sets])


def contamination(df: DataFrame, eval_df: DataFrame, n: int = 5,
                  threshold: float = 0.5, id_col: str = "doc_id",
                  text_col: str = "text",
                  broadcast_eval: bool = True) -> DataFrame:
    """Train-set decontamination against an eval/benchmark set: per
    training doc, the fraction of its distinct n-gram shingles that
    appear anywhere in the eval set -> (doc_id, n_shingles, n_hit,
    overlap_x1e4, contaminated).

    Docs with fewer than ``n`` tokens have no shingles and are not
    scored (nothing to leak at the measured granularity).

    Scale: eval sets are benchmark-sized, so the distinct eval-shingle
    relation broadcasts (``broadcast_eval``) and the whole check is one
    map-side semi-join over the training scan — no shuffle of the
    training corpus. For an eval set too big to broadcast, pass False
    and it becomes a standard shuffled semi-join."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import x1e4

    tr = shingles(df, n, id_col, text_col)
    ev = shingles(eval_df, n, id_col, text_col).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    sizes = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (tr.join(ev, "shingle", "left_semi")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit")))
    out = (sizes.join(hits, "doc_id", "left")
           .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0))))
    frac = F.col("n_hit") / F.col("n_shingles")
    return out.select("doc_id", "n_shingles", "n_hit",
                      x1e4(frac).alias("overlap_x1e4"),
                      (frac >= threshold).alias("contaminated"))


def minhash_salt(i: int) -> int:
    """Deterministic 60-bit XOR salt for hash variant i — derived the
    same way in the DuckDB oracle (md5 of the decimal index)."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[1:16], 16)


def minhash_signatures(df: DataFrame, n_hashes: int = 8, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """k MinHash values per doc over its n-gram shingles. ONE md5 per
    distinct shingle (folded to a 60-bit int), then k XOR-salted
    variants: sig_i = min over shingles of (h60(g) ^ salt_i). XOR with
    a constant is a bijection on the 60-bit space, so each salt yields
    an independent-enough min-wise permutation at 1/k of the k-md5
    cost (the hash pass dominated the dedupe suite wall). Docs with no
    shingle (fewer than n tokens) hash the whole token string.
    Engine-portable: md5 + substring + conv exist in DuckDB too."""
    # project the token array to a column first — inlined, the regex
    # tokenize would re-run once per gram inside the transform lambda
    # (O(T^2) per doc; see shingles())
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    k = F.size(toks) - (n - 1)
    grams = F.when(k >= 1, F.array_distinct(F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))) \
        .otherwise(F.array(F.concat_ws(" ", toks)))
    h60 = F.transform(grams, lambda g: F.conv(
        F.substring(F.md5(g), 2, 15), 16, 10).cast("long"))
    hashed = base.select("doc_id", h60.alias("_h"))
    cols = [F.array_min(F.transform(
                F.col("_h"), lambda h: h.bitwiseXOR(F.lit(minhash_salt(i)))))
            .alias(f"sig{i}") for i in range(n_hashes)]
    return hashed.select("doc_id", *cols)


def minhash_lsh_pairs(df: DataFrame, n_hashes: int = 8, band_size: int = 2,
                      n: int = 3, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_band_bucket: int | None = None) -> DataFrame:
    """LSH candidate pairs: signatures split into bands of
    ``band_size``; a pair is a candidate when ANY band matches
    exactly. Returns (doc_a, doc_b, n_bands_matched).

    ``max_band_bucket`` is the skew guard for billion-doc runs: a band
    bucket holding more than this many docs (boilerplate — license
    headers, generated files — hashing to one band key) would emit
    O(size^2) pairs from a single join key; such buckets are dropped
    BEFORE the self-join (explicit recall trade, mirror of
    ``max_shingle_df``). Default None keeps the exact oracle
    semantics."""
    sig = minhash_signatures(df, n_hashes, n, id_col, text_col)
    n_bands = n_hashes // band_size
    bands = sig.select("doc_id", *[
        F.md5(F.concat_ws("|", *[F.col(f"sig{b * band_size + j}").cast("string")
                                 for j in range(band_size)])).alias(f"band{b}")
        for b in range(n_bands)])
    stacked = bands.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band_no"), F.col(f"band{b}").alias("band_key"))
        for b in range(n_bands)])).alias("bk")) \
        .select("doc_id", "bk.band_no", "bk.band_key")
    if max_band_bucket is not None:
        hot = (stacked.groupBy("band_no", "band_key")
               .agg(F.count(F.lit(1)).alias("sz"))
               .filter(F.col("sz") > max_band_bucket))
        stacked = stacked.join(hot.select("band_no", "band_key"),
                               ["band_no", "band_key"], "left_anti")
    # materialize once: both sides of the self-join would otherwise
    # re-run the whole shingle->minhash->band pipeline (narrow rows:
    # doc_id + band_no + 32-char key)
    stacked = stacked.persist()
    stacked.count()
    a = stacked.alias("a")
    b = stacked.alias("b")
    out = (a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
                  & (F.col("a.band_key") == F.col("b.band_key"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
           .groupBy(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
           .agg(F.count(F.lit(1)).alias("n_bands_matched")))
    return _materialized(out, [stacked])


_SIMHASH_BITS = 64


def simhash_udf():
    """pandas UDF: token array -> 64-bit SimHash (weighted bit
    majority of md5-derived 64-bit token hashes). Vectorized per
    Arrow batch with numpy bit unpacking."""
    @F.pandas_udf(T.LongType())
    def _simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-task token-hash memo: real corpora share vocabulary
        # heavily, so md5 runs once per distinct token per task, not
        # once per occurrence (~100x fewer digests on natural text)
        memo: dict[str, int] = {}

        def h64(t: str) -> int:
            v = memo.get(t)
            if v is None:
                v = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                                   "big")
                memo[t] = v
            return v

        for toks_series in it:
            out = np.zeros(len(toks_series), dtype=np.int64)
            for row_i, toks in enumerate(toks_series):
                if toks is None or len(toks) == 0:
                    continue
                uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                         return_counts=True)
                h = np.fromiter((h64(t) for t in uniq), dtype=np.uint64,
                                count=len(uniq))
                bits = ((h[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64))
                        & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                fp = np.uint64(0)
                for bit_pos in np.flatnonzero(votes > 0):
                    fp |= np.uint64(1) << np.uint64(bit_pos)
                out[row_i] = fp.astype(np.int64)
            yield pd.Series(out)
    return _simhash


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"),
                     simhash_udf()(tokens_col(text_col)).alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, max_hamming: int = 7,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked
    multi-index-hashing style: 4 chunks of 16 bits. A pair within
    hamming <= 7 has SOME chunk differing in <= floor(7/4) = 1 bit
    (generalized pigeonhole), so the candidate join is asymmetric:
    the left side emits each doc's 4 exact chunk values, the right
    side the 4 * 17 one-bit neighborhoods — exact(x) meets a neighbor
    key of y exactly on the <=1-bit-off chunk. Random collisions land
    in a 2^16 key space with 4 x 17 key pairs per doc pair
    (~n^2/1000 candidates) vs the old 8-bit chunks' 8 buckets of n/256
    (~n^2/32) — a ~30x cut in the quadratic term that kills
    billion-doc runs; a true pair is emitted at most 4 times. Exact
    hamming is computed and filtered BEFORE the dedupe shuffle, so
    distinct() carries only true near-dup pairs, never the candidate
    flood. At full scale, precompute the chunk keys at ingest and
    bucket the table by them."""
    if max_hamming > 7:
        raise ValueError("blocking guarantees recall only for max_hamming <= 7")
    sh = simhash(df, id_col, text_col)
    # materialize the fingerprints ONCE: both sides of the asymmetric
    # join derive from `sh`, and Spark runs the two scan stages of a
    # shuffle join concurrently — without an eager persist the Python
    # simhash kernel would execute twice over the full corpus. The
    # cached relation is narrow (doc_id + 64-bit fp); at full scale
    # fingerprints are precomputed at ingest instead (see below).
    sh = sh.persist()
    sh.count()

    def _chunk(c):
        return F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF))

    # asymmetric MIH join: the exact side emits 4 keys/doc, the
    # neighborhood side 4 * 17; a pair (x, y) with x < y is found via
    # exact(x) = some neighbor of y on the <=1-bit-off chunk, and per
    # chunk at most ONE neighbor key can equal exact(x), so a true pair
    # is emitted at most 4 times (vs ~n/256 bucket mates before)
    exact = sh.select(
        "doc_id", "simhash", F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk_no"), _chunk(c).alias("chunk_val"))
            for c in range(4)])).alias("ck")) \
        .select("doc_id", "simhash", "ck.chunk_no", "ck.chunk_val")
    nb_keys = []
    for c in range(4):
        val = _chunk(c)
        nb_keys.append(F.struct(F.lit(c).alias("chunk_no"),
                                val.alias("chunk_val")))
        nb_keys.extend(
            F.struct(F.lit(c).alias("chunk_no"),
                     val.bitwiseXOR(F.lit(1 << bit)).alias("chunk_val"))
            for bit in range(16))
    neigh = sh.select(
        "doc_id", "simhash", F.explode(F.array(*nb_keys)).alias("ck")) \
        .select("doc_id", "simhash", "ck.chunk_no", "ck.chunk_val")
    a, b = exact.alias("a"), neigh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    out = (a.join(b, (F.col("a.chunk_no") == F.col("b.chunk_no"))
                  & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
           .select(F.col("a.doc_id").alias("doc_a"),
                   F.col("b.doc_id").alias("doc_b"),
                   ham.alias("hamming"))
           .filter(F.col("hamming") <= max_hamming)
           .distinct())
    return _materialized(out, [sh])


def duplicate_spans(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    materialize: str = "disk") -> DataFrame:
    """Exact duplicate-SPAN detection (substring dedup, Lee et al.
    "Deduplicating Training Data Makes Language Models Better"): find
    every k-token window that occurs more than once corpus-wide, keep
    its FIRST occurrence (global min (doc_id, pos)), and emit the
    maximal token-position spans to cut from every other document —
    adjacent/overlapping flagged windows merged per doc.

    The paper builds a suffix array; the Spark-native equivalent is a
    rolling k-token window join — same duplicated-substring set for
    span length >= k, no giant global sort, one shuffle:

    1. posexplode the k-shingle array -> (doc_id, pos, xxhash64(gram));
    2. groupBy the gram hash -> (count, global first key
       (doc_id*2^20 + pos)), kept only where count > 1, then equi-join
       back onto the occurrences — key != first marks the occurrence
       as a cut candidate;
    3. gaps-and-islands per doc (windows overlap iff pos gap <= k)
       merges flagged windows into maximal [span_start, span_end)
       token spans.

    Returns (doc_id, span_start, span_end, n_windows) — span bounds
    are token positions, end-exclusive; n_windows is the number of
    flagged k-windows merged into the span.

    Scale: the heavy relation is n_tokens rows of (long, int, long);
    the gram string itself never shuffles (hashed before the
    exchange). Hot grams (boilerplate k-grams that appear in half the
    corpus) are the skew risk — a window over the gram hash would pin
    every occurrence of one gram in a single task (AQE cannot split a
    window partition), so the group stats are computed with a
    map-side-combined groupBy (each partition contributes ONE partial
    row per hot gram) and joined back by gram hash, which AQE's
    skew-join splitting CAN rebalance. The join build side holds only
    grams with count > 1 — boilerplate-free corpora join against a
    near-empty relation. Position key packs pos into 20 bits: docs
    longer than 2^20 tokens would need a wider shift.

    ``materialize`` controls how the O(corpus tokens) occurrence
    relation is shared between the group-stats agg and the join-back:
    ``"disk"`` (default) persists it DISK_ONLY — at 100 TB the
    relation is ~24 B/token and memory-persist would evict or OOM
    executors, while local-disk spill is sequential write/read;
    ``"memory"`` persists MEMORY_AND_DISK (fastest at bench scale);
    ``"recompute"`` skips the persist entirely and re-derives the
    grams per branch (one extra tokenize+hash scan, zero storage).
    """
    from pyspark.sql import Window as W
    from pyspark.storagelevel import StorageLevel

    if materialize not in ("disk", "memory", "recompute"):
        raise ValueError(f"materialize must be disk|memory|recompute, "
                         f"got {materialize!r}")

    # token array behind a projection boundary — inlined it re-runs
    # the regex split once per k-gram (O(T^2) per doc; see shingles())
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))))
    occ = (base.filter(F.size(toks) >= k)
           .select("doc_id", F.posexplode(grams).alias("pos", "g"))
           .withColumn("key",
                       F.col("doc_id") * (1 << 20) + F.col("pos")))
    # materialize the occurrence relation once: both the group-stats
    # agg and the join-back consume it, and re-running the k-gram
    # generation (O(tokens * k) string work) per branch would double
    # the scan cost (same pattern as the pair emitters below)
    persisted = []
    if materialize != "recompute":
        occ = occ.persist(StorageLevel.DISK_ONLY if materialize == "disk"
                          else StorageLevel.MEMORY_AND_DISK)
        occ.count()
        persisted.append(occ)
    gstats = (occ.groupBy("g")
              .agg(F.count(F.lit(1)).alias("n_occ"),
                   F.min("key").alias("first_key"))
              .filter(F.col("n_occ") > 1))
    flagged = (occ.join(gstats, "g")
               .filter(F.col("key") != F.col("first_key"))
               .select("doc_id", "pos"))
    wd = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.lag("pos").over(wd).isNull()
                 | (F.col("pos") - F.lag("pos").over(wd) > k), 1).otherwise(0)
    island = F.sum(brk).over(
        wd.rowsBetween(W.unboundedPreceding, W.currentRow))
    out = (flagged.withColumn("island", island)
           .groupBy("doc_id", "island")
           .agg(F.min("pos").alias("span_start"),
                (F.max("pos") + k).alias("span_end"),
                F.count(F.lit(1)).alias("n_windows"))
           .drop("island"))
    return _materialized(out, persisted)


def cut_spans(df: DataFrame, spans: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Apply duplicate-span decisions: remove every token whose
    position falls in a [span_start, span_end) interval of ``spans``
    (the output of :func:`duplicate_spans`) and rebuild the text.

    Returns (doc_id, clean_text, n_tokens_cut). Docs with no spans
    pass through untouched (left join). The span list per doc is tiny
    (merged maximal intervals), so it aggregates to an array and the
    per-token containment test is a pure Catalyst ``exists`` over that
    array — no shuffle beyond the spans-side groupBy, corpus text
    never moves twice.
    """
    sp = (spans.groupBy(F.col("doc_id").alias("_sid"))
          .agg(F.collect_list(F.struct(
              F.col("span_start").cast("int").alias("s"),
              F.col("span_end").cast("int").alias("e"))).alias("_spans")))
    # tokenize once per row behind a projection (the expression is
    # referenced four times below; bound to a column it is shared)
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    joined = base.join(sp, F.col("doc_id") == F.col("_sid"), "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp_: (i >= sp_["s"]) & (i < sp_["e"]))
    kept = F.when(F.col("_spans").isNull(), toks).otherwise(
        F.filter(toks, lambda t, i: ~covered(i)))
    return (joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_tokens_cut")))


# ---------------------------------------------------------------- URL dedup

_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="


def url_normalize(url) -> "F.Column":
    """CCNet-style URL canonicalization as one Catalyst expression
    chain: lowercase -> drop fragment -> drop scheme -> drop leading
    "www." -> drop tracking query params (utm_*, fbclid, gclid, ...)
    -> drop a trailing "?" / "/". Two pages that differ only in those
    decorations normalize to the same key, which is what CCNet dedups
    Common Crawl on before any content hashing (cheap: no tokenize,
    no shuffle — a narrow map)."""
    u = F.lower(url if isinstance(url, F.Column) else F.col(url))
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    base = F.regexp_replace(F.substring_index(u, "?", 1), r"/$", "")
    qs = F.when(u.contains("?"), F.substring_index(u, "?", -1)) \
          .otherwise(F.lit(""))
    kept = F.filter(F.split(qs, "&"),
                    lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE))
    return F.when(F.size(kept) > 0,
                  F.concat(base, F.lit("?"), F.array_join(kept, "&"))) \
            .otherwise(base)


def url_dup_groups(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized URL: (norm_url, n_docs, keep_id,
    doc_ids) for groups with >= 2 members — the URL-level first pass of
    a Common-Crawl-style pipeline (hash groupBy, scale-safe; content
    dedup runs after)."""
    norm = url_normalize(url_col).alias("norm_url")
    return (df.select(norm, F.col(id_col).alias("doc_id"))
            .groupBy("norm_url")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keep_id"),
                 F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
            .filter(F.col("n_docs") >= 2)
            .orderBy("norm_url"))


# ------------------------------------------------------------- bloom filter

def _bloom_index_cols(col: "F.Column", n_bits: int, k: int, seed: int):
    """k bucket indices from the engine's cross-engine md5 fold of
    "<v>:<seed>:<i>" — pure column expressions."""
    out = []
    for i in range(k):
        h = F.conv(F.substring(
            F.md5(F.concat_ws(":", col.cast("string"),
                              F.lit(str(seed)), F.lit(str(i)))),
            2, 15), 16, 10).cast("long")
        out.append(F.pmod(h, F.lit(n_bits)))
    return out


def bloom_build(df: DataFrame, col: str, n_bits: int = 1 << 20,
                k: int = 4, seed: int = 0) -> np.ndarray:
    """Build a Bloom filter over a column, distributed: each row emits
    its k bucket indices (map-side), `distinct()` reduces to at most
    ``n_bits`` ints, and only THOSE reach the driver — the collect is
    bounded by the filter size, never the corpus size. Returns a
    packed bit array (n_bits/8 bytes) for broadcasting."""
    idx = (df.select(F.explode(F.array(
               *_bloom_index_cols(F.col(col), n_bits, k, seed))).alias("i"))
           .distinct().collect())
    bits = np.zeros(n_bits, dtype=bool)
    if idx:
        bits[np.fromiter((r["i"] for r in idx), dtype=np.int64)] = True
    return np.packbits(bits)


def bloom_might_contain(spark, packed: np.ndarray, col: str,
                        n_bits: int = 1 << 20, k: int = 4,
                        seed: int = 0):
    """Membership Column: True iff ALL k bits are set (standard Bloom
    "might contain"; False is a guarantee of absence). The packed
    filter broadcasts once per executor (n_bits/8 bytes — 128 KiB at
    the default size); the check is an Arrow-batched pandas UDF over
    the md5 fold, the one per-row Python step in this module (the bit
    probe needs random access into the broadcast array)."""
    bc = spark.sparkContext.broadcast(packed)

    @F.pandas_udf(T.BooleanType())
    def _check(vs: pd.Series) -> pd.Series:
        bits = np.unpackbits(bc.value).astype(bool)
        out = np.ones(len(vs), dtype=bool)
        for j, v in enumerate(vs):
            s = str(v)
            for i in range(k):
                h = int(hashlib.md5(
                    f"{s}:{seed}:{i}".encode()).hexdigest()[1:16], 16)
                if not bits[h % n_bits]:
                    out[j] = False
                    break
        return pd.Series(out)

    return _check(F.col(col).cast("string"))


def bloom_new_docs(spark, new_df: DataFrame, corpus_df: DataFrame,
                   col: str = "fp", n_bits: int = 1 << 20, k: int = 4,
                   seed: int = 0) -> DataFrame:
    """Incremental dedup of a new batch against a corpus WITHOUT
    joining the corpus: keep rows whose key the corpus Bloom filter
    definitely does not contain.

    Guarantees: no false negatives — every returned row is genuinely
    new. False positives (rate ~ (1 - e^{-kn/m})^k) drop some new rows
    as "seen"; size n_bits for the corpus cardinality accordingly.
    This is the streaming-friendly complement of the exact anti-join:
    the corpus is scanned ONCE at build time (micro-batches then
    filter map-side against the broadcast bits), where an anti-join
    would re-shuffle corpus-sized state every batch."""
    packed = bloom_build(corpus_df, col, n_bits, k, seed)
    return new_df.filter(
        ~bloom_might_contain(spark, packed, col, n_bits, k, seed))
