"""Text-analysis operators for large-scale training-data pipelines.

All Catalyst-native column expressions (whole-stage codegen, no
Python in the hot path); each has an ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` so the driver's DuckDB gate checks it
value-for-value.

Tokenization here is the ``simple`` analyzer (lowercase + whitespace
split) — the SQL-expressible one. The code-aware analyzer lives in
``functions.tokenizer`` and is checked by the Python oracle instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small fixed stopword sets per language family (deterministic heuristic)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
}


def tokens_col(text_col: str = "text") -> Column:
    """simple-analyzer tokens: lowercase, split on whitespace runs."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")


def time_bucket(col, secs: int) -> Column:
    """Epoch-aligned fixed-interval timestamp bucket — the ONE shared
    bucketing expression (ES|QL BUCKET/DATE_TRUNC, TSDS downsample)
    so boundary rules (negative pre-1970 micros floor, NTZ cast) stay
    identical everywhere."""
    if isinstance(col, str):
        col = F.col(col)
    us = int(secs) * 1_000_000
    return F.timestamp_micros(
        (F.floor(F.unix_micros(col.cast("timestamp")) / us) * us)
        .cast("long"))


def x1e4(col: Column) -> Column:
    """Cross-engine-stable 4-decimal fixed-point: floor(x*1e4 + 0.5) as
    long — pure IEEE ops, bit-identical in any engine, unlike round()."""
    return F.floor(col * 10000.0 + 0.5).cast("long")


def token_count(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"),
                     F.size(tokens_col(text_col)).cast("long").alias("n_tokens"))


# BPE-ish pre-tokenization pattern (GPT-2 style, simplified to the
# regex subset Java (Spark) and RE2 (DuckDB) treat identically):
# letter runs / digit runs / punctuation runs, each absorbing one
# leading space — the unit LLM tokenizers split on before merges.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Pre-merge BPE token count — the budget estimate an LLM-data
    pipeline uses for context packing; JVM-side regexp, no UDF."""
    n = F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(BPE_SPLIT_RE), F.lit(0)))
    return df.select(F.col(id_col).alias("doc_id"),
                     n.cast("long").alias("n_bpe_tokens"))


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features +
    a composite [0,1] score (higher = more natural-language-like)."""
    # tokenize once per row behind a projection — the token array is
    # referenced by every output column below, and inlined Catalyst
    # would re-run the regex split per reference
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    n_chars_tok = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, n_chars_tok / n_tokens).otherwise(F.lit(0.0))
    score = (F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
             + F.least(F.lit(1.0), stop_ratio * 4.0) * 0.3
             + F.least(F.lit(1.0), mean_tok_len / F.lit(8.0)) * 0.2)
    # outputs are floor(x*1e4+0.5) scaled ints, NOT round(x, 4) doubles:
    # Spark's round (shortest-repr BigDecimal HALF_UP) and other
    # engines' round (true-binary) disagree on decimal .5 boundaries;
    # floor-scaling is identical IEEE arithmetic everywhere.
    return base.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        x1e4(stop_ratio).alias("stop_ratio_x1e4"),
        x1e4(mean_tok_len).alias("mean_tok_len_x1e4"),
        x1e4(score).alias("quality_x1e4"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_ns: tuple = (2, 3),
                     dup_ns: tuple = (5,)) -> DataFrame:
    """Gopher-style repetition quality features (Rae et al. 2021 §A1.1
    "repetition removal", re-expressed Spark-first):

    - ``dup_line_frac_x1e4``: fraction of newline-split lines that are
      duplicates of another line in the doc;
    - ``dup_line_char_frac_x1e4``: fraction of line characters living
      in duplicated lines;
    - ``top{n}_char_frac_x1e4`` (n in ``top_ns``): max over token
      n-grams of count * gram_chars, over total token chars — the
      character share of the most dominant n-gram;
    - ``dup{n}_char_frac_x1e4`` (n in ``dup_ns``): character share of
      n-grams occurring more than once.

    Line metrics are per-row array expressions (codegen; the line
    self-count is O(L^2) on the tens of lines per doc). Gram metrics
    go through explode -> (doc_id, gram) count — the distributed plan:
    per-doc gram multisets never materialize driver-side and hot docs
    parallelize across partitions. Docs shorter than n tokens score 0.
    """
    # three projection stages so nothing expensive evaluates twice:
    # tokenize + line-split bind first (inlined, the inner filter's
    # `lines` reference would RE-SPLIT the text once per line), then
    # the O(L^2) duplicate-line array binds (it feeds two stats), then
    # the stats read plain columns
    pre = df.select(F.col(id_col).alias("doc_id"),
                    tokens_col(text_col).alias("toks"),
                    F.split(F.col(text_col), "\n").alias("__lines"))
    lines = F.col("__lines")
    toks = F.col("toks")
    pre = pre.select(
        "doc_id", "toks", "__lines",
        F.filter(lines, lambda ln: F.size(
            F.filter(lines, lambda x: x == ln)) > 1).alias("__dup_lines"))
    dup_lines = F.col("__dup_lines")
    line_chars = F.aggregate(lines, F.lit(0),
                             lambda acc, ln: acc + F.length(ln))
    dup_line_chars = F.aggregate(dup_lines, F.lit(0),
                                 lambda acc, ln: acc + F.length(ln))
    n_lines = F.size(lines)
    base = pre.select(
        "doc_id",
        "toks",
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
         .alias("tok_chars"),
        # all copies of a repeated line count as duplicates (Gopher
        # semantics), consistent with the char-fraction below
        x1e4(F.when(n_lines > 0, F.size(dup_lines) / n_lines)
             .otherwise(F.lit(0.0))).alias("dup_line_frac_x1e4"),
        x1e4(F.when(line_chars > 0, dup_line_chars / line_chars)
             .otherwise(F.lit(0.0))).alias("dup_line_char_frac_x1e4"))

    out = base.select("doc_id", "tok_chars", "dup_line_frac_x1e4",
                      "dup_line_char_frac_x1e4")
    for n, kind in sorted([(n, "top") for n in top_ns]
                          + [(n, "dup") for n in dup_ns]):
        k = F.size(F.col("toks")) - (n - 1)
        grams = F.when(k >= 1, F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)))) \
            .otherwise(F.array().cast("array<string>"))
        counted = (base.select("doc_id", F.explode(grams).alias("gram"))
                   .groupBy("doc_id", "gram")
                   .agg(F.count(F.lit(1)).alias("c")))
        chars = F.col("c") * (F.length("gram") - (n - 1))
        if kind == "top":
            agg = counted.groupBy("doc_id").agg(
                F.max(chars).alias(f"_{kind}{n}"))
        else:
            agg = counted.groupBy("doc_id").agg(
                F.sum(F.when(F.col("c") > 1, chars).otherwise(F.lit(0)))
                 .alias(f"_{kind}{n}"))
        out = (out.join(agg, "doc_id", "left")
               .withColumn(f"{kind}{n}_char_frac_x1e4",
                           x1e4(F.when(F.col("tok_chars") > 0,
                                       F.coalesce(F.col(f"_{kind}{n}"), F.lit(0))
                                       / F.col("tok_chars"))
                                .otherwise(F.lit(0.0))))
               .drop(f"_{kind}{n}"))
    return out.drop("tok_chars")


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """n-gram-free language-ID heuristic: argmax of per-language
    stopword hits, deterministic tie-break by language code; 'und'
    when nothing matches."""
    # one tokenize per row (each language's hit counter references the
    # token array; see quality_score)
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    hit_cols = {lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
                for lang, words in STOPWORDS.items()}
    out = base.select("doc_id", *[
        v.alias(f"hits_{k}") for k, v in hit_cols.items()])
    best = F.greatest(*[F.col(f"hits_{k}") for k in STOPWORDS])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):  # earlier langs win ties
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best),
                      F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


# PII patterns restricted to the regex subset Java and RE2 (DuckDB)
# treat identically: no lookarounds, no backrefs, ASCII classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
}


def pii_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-doc PII hit counts (emails / IPv4 / phone-like digit runs)
    + a has_pii flag — the triage pass an LLM-data pipeline runs
    before deciding redact-vs-drop. Pure JVM regexp, no UDF."""
    counts = {k: F.size(F.regexp_extract_all(F.col(text_col),
                                             F.lit(p), F.lit(0)))
              for k, p in PII_PATTERNS.items()}
    out = df.select(F.col(id_col).alias("doc_id"), *[
        v.cast("long").alias(f"n_{k}") for k, v in counts.items()])
    flag = None
    for k in PII_PATTERNS:
        c = F.col(f"n_{k}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Replace PII spans with typed placeholders, longest-pattern
    first (emails before phones so the digits of a redacted email
    can't re-match as a phone)."""
    red = F.col(text_col)
    for k in ("email", "ipv4", "phone"):
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    return df.withColumn(text_col, red)


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint: md5 of whitespace-normalized,
    lowercased text (exact-dup key)."""
    norm = F.concat_ws(" ", tokens_col(text_col))
    return df.select(F.col(id_col).alias("doc_id"),
                     F.md5(norm).alias("fp"))


def shingle_fingerprint(df: DataFrame, n: int = 5, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Rolling (token-level) n-gram fingerprint: min md5 over the
    doc's n-gram shingles — a 1-hash MinHash usable as a cheap
    near-dup blocking key."""
    # token array behind a projection — inlined, the regex split would
    # re-run once per shingle inside the transform lambda (O(T^2))
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    k = F.size(toks) - (n - 1)
    grams = F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))) \
        .otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return base.select("doc_id", F.array_min(grams).alias("shingle_fp"))


def chunk_documents(df: DataFrame, max_tokens: int, *, overlap: int = 0,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    ordered: bool = True) -> DataFrame:
    """Split documents into token windows of at most ``max_tokens``
    with ``overlap`` tokens of context carried between consecutive
    chunks — the standard long-document preprocessing before packing
    (pair with ``sampling.pack_sequences``). -> (doc_id, chunk_id,
    n_tokens, chunk_text), chunk_id 0-based per doc.

    Pure Catalyst: tokenize -> F.sequence of window starts ->
    transform/slice — one narrow pass, no Python. ``ordered=True``
    (the default) adds a deterministic global sort for stable output;
    pass ``ordered=False`` on the 100 TB path (or before
    order-insensitive consumers like pack_sequences_partitioned) to
    keep the op shuffle-free. The final chunk may be shorter;
    stride = max_tokens - overlap; empty docs produce no chunks
    (nothing to train on)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    # tokenize once per row — slice(toks) inside the transform lambda
    # would otherwise re-run the regex split once per chunk
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)),
                        F.lit(stride))
    chunks = F.transform(
        starts, lambda s, i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(toks, s, max_tokens).alias("_toks")))
    out = (base.select("doc_id",
                       F.explode(F.when(n > 0, chunks)).alias("c"))
            .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                    F.size("c._toks").cast("long").alias("n_tokens"),
                    F.concat_ws(" ", F.col("c._toks")).alias("chunk_text")))
    return out.orderBy("doc_id", "chunk_id") if ordered else out


def unigram_logprob_score(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          vocab_df: DataFrame | None = None) -> DataFrame:
    """CCNet-style language-model quality proxy: mean unigram negative
    log2-probability of each doc's tokens under the corpus (or a
    provided reference vocabulary) unigram distribution -> (doc_id,
    n_tokens, nll_x1e4). Lower = more typical text; the CCNet recipe
    buckets corpora into head/middle/tail on exactly this statistic.

    Plan: one explode+groupBy builds the unigram table (or pass
    ``vocab_df(term, cnt)`` from a reference corpus — the CCNet shape,
    where the LM is trained on a bounded reference like Wikipedia),
    a join scores tokens, one aggregation per doc. A PROVIDED vocab is
    assumed bounded and broadcasts (map-side end-to-end); the
    corpus-mode vocab is corpus-sized (every distinct term) and joins
    through the normal shuffle path — broadcasting it at 100 TB would
    be a scale-killer. OOV tokens get an add-one-smoothed floor
    probability so a single unseen term cannot dominate."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens_col(text_col)).alias("term")))
    if vocab_df is None:
        # corpus mode needs toks twice (vocab build + scoring join) and
        # the totals are collected eagerly below — materialize the
        # tokenized stream ONCE instead of re-tokenizing the corpus per
        # consumer (same eager-localCheckpoint pattern as the dedup
        # pair emitters)
        toks = toks.localCheckpoint(eager=True)
        vocab_df = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        vocab_rel = vocab_df  # unbounded: no broadcast hint
    else:
        vocab_rel = F.broadcast(vocab_df)
    totals = vocab_df.agg(F.sum("cnt").alias("n"),
                          F.count(F.lit(1)).alias("v")).collect()[0]
    n_total, v = float(totals["n"]), float(totals["v"])
    # add-one smoothing; OOV -> cnt 0 under the same denominator
    p = (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / F.lit(n_total + v)
    scored = (toks.join(vocab_rel, "term", "left")
              .select("doc_id", (-F.log2(p)).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 x1e4(F.avg("nll")).alias("nll_x1e4"))
            .orderBy("doc_id"))


def bigram_logprob_score(df: DataFrame, *, lam: float = 0.8,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Interpolated bigram-LM quality proxy (the KenLM-shaped upgrade
    of :func:`unigram_logprob_score`): per doc, the mean negative
    log2-probability of each token given its predecessor under a
    Jelinek-Mercer mixture

        P(w | v) = lam * cnt(v,w)/cnt(v,*) + (1-lam) * P1(w)

    with P1 the add-one-smoothed corpus unigram distribution (so an
    unseen bigram backs off instead of zeroing the doc). ->
    (doc_id, n_events, nll_x1e4) over docs with >= 2 tokens; lower =
    more fluent. This is the perplexity signal CCNet-style pipelines
    bucket on when they train a real n-gram LM rather than unigrams.

    Plan: bigram events come from ONE codegen zip of each doc's token
    array with its own tail (no positional self-join); the bigram /
    context / unigram count tables are corpus-shaped groupBys joined
    back through the normal shuffle path (never broadcast — at 100 TB
    the bigram vocabulary is huge), and the doc score is one final
    aggregation."""
    toks = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("_t"))
    n = F.size("_t")
    pairs = (toks.filter(n >= 2)
             .select("doc_id",
                     F.explode(F.arrays_zip(
                         F.slice("_t", 1, n - 1).alias("v"),
                         F.slice("_t", 2, n - 1).alias("w"))).alias("_p"))
             .select("doc_id", F.col("_p.v").alias("v"),
                     F.col("_p.w").alias("w")))
    pairs = pairs.localCheckpoint(eager=True)   # 3 consumers below
    bi = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = bi.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    uni = (df.select(F.explode(tokens_col(text_col)).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
    tot = uni.agg(F.sum("c_w").alias("n"),
                  F.count(F.lit(1)).alias("vsz")).collect()[0]
    n_total, vsz = float(tot["n"]), float(tot["vsz"])
    p1 = (F.coalesce(F.col("c_w"), F.lit(0)) + 1.0) / F.lit(n_total + vsz)
    pbg = (F.coalesce(F.col("c_vw"), F.lit(0)).cast("double")
           / F.coalesce(F.col("c_v"), F.lit(1)).cast("double"))
    p = F.lit(float(lam)) * pbg + F.lit(1.0 - float(lam)) * p1
    scored = (pairs.join(bi, ["v", "w"], "left")
              .join(ctx, "v", "left")
              .join(uni, "w", "left")
              .select("doc_id", (-F.log2(p)).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 x1e4(F.avg("nll")).alias("nll_x1e4"))
            .orderBy("doc_id"))


def ccnet_buckets(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  vocab_df: DataFrame | None = None,
                  n_buckets: int = 3) -> DataFrame:
    """CCNet's head/middle/tail split: rank every doc by the unigram-LM
    quality proxy (:func:`unigram_logprob_score`, lower = more fluent)
    and cut the corpus into ``n_buckets`` equal-frequency bands —
    bucket 1 = head (best), ``n_buckets`` = tail. (doc_id, n_tokens,
    nll_x1e4, bucket). Ties break on doc_id so the split is exactly
    reproducible across engines and runs.

    Plan: the LM scoring pass + ONE global ntile window. The window's
    total-order sort is the same cost profile as any global ranking
    (range-partitioned sort, no driver collect); CCNet itself does a
    corpus-wide percentile cut here too."""
    from pyspark.sql import Window

    scored = unigram_logprob_score(df, id_col=id_col, text_col=text_col,
                                   vocab_df=vocab_df)
    w = Window.orderBy(F.asc("nll_x1e4"), F.asc("doc_id"))
    return scored.withColumn("bucket", F.ntile(int(n_buckets)).over(w))


# C4's text-quality heuristics (Raffel et al. 2020, appendix): the
# line- and page-level rules the C4 pipeline applies to Common Crawl.
_C4_POLICY_RE = r"(?i)(cookie policy|privacy policy|terms of use|uses cookies)"
_C4_LOREM_RE = r"(?i)lorem ipsum"


def c4_quality_flags(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     min_words: int = 5) -> DataFrame:
    """C4-style page filters as one pure-column pass -> per-doc flags
    plus the composite keep decision:

    - ``has_lorem``      page contains "lorem ipsum"
    - ``has_brace``      page contains "{" (code/JS leakage)
    - ``has_policy``     boilerplate policy phrases
    - ``n_words``        whitespace word count
    - ``terminal_ratio_x1e4``  fraction of lines ending in terminal
      punctuation (. ! ? ") — C4 keeps only lines that do; here the
      per-page ratio is surfaced so the cut threshold stays a knob
    - ``keep``           no lorem/brace/policy AND n_words >= min_words

    Everything is a Catalyst regexp/array expression — whole-stage
    codegen, no UDF, trivially scale-safe."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda ln: F.trim(ln) != "")
    terminal = F.filter(lines, lambda ln: F.trim(ln).rlike('[.!?"]$'))
    has_lorem = F.col(text_col).rlike(_C4_LOREM_RE)
    has_brace = F.col(text_col).contains("{")
    has_policy = F.col(text_col).rlike(_C4_POLICY_RE)
    n_words = F.size(words)
    ratio = F.when(F.size(lines) > 0,
                   F.size(terminal).cast("double")
                   / F.size(lines).cast("double")).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_policy.alias("has_policy"),
        n_words.cast("long").alias("n_words"),
        x1e4(ratio).alias("terminal_ratio_x1e4"),
        (~has_lorem & ~has_brace & ~has_policy
         & (n_words >= int(min_words))).alias("keep"))


def _md5_fold60(col: Column) -> Column:
    """The engine's standard cross-engine hash: md5 -> 15 hex chars ->
    60-bit non-negative long (identical in Spark SQL and DuckDB; same
    fold the MinHash / random_score paths use)."""
    return F.conv(F.substring(F.md5(col), 2, 15), 16, 10).cast("long")


def _word_grams(text_col: str) -> Column:
    """Unigrams + space-joined bigrams of the simple-analyzer tokens —
    the fastText feature set (wordNgrams=2) as one array expression."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= 2, F.concat(toks, bigrams)).otherwise(toks)


def hashed_ngram_classifier(df: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", seed: int = 7,
                            n_bits: int = 18,
                            weights_df: DataFrame | None = None) -> DataFrame:
    """fastText-shaped quality classifier over the hashing trick:
    features are unigrams + word-bigrams hashed into ``2**n_bits``
    buckets, the doc score is sigmoid(mean bucket weight) -> (doc_id,
    n_feats, prob_x1e4). The standard model-based quality filter of an
    LLM-data pipeline (CCNet/fastText lang+quality models, GPT-3's
    WebText classifier) re-expressed as Spark column algebra.

    Two modes:
    - ``weights_df(bucket long, weight double)`` — a trained linear
      model (train offline, e.g. scikit/fastText, export buckets):
      features explode, bucket via the md5 fold, broadcast join, one
      per-doc aggregation. The join is the hashing trick's whole point:
      the model is dense in bucket space (<= 2**n_bits rows, fits in a
      broadcast) no matter how open the vocabulary is.
    - seeded (default) — weights derived deterministically from
      (seed, bucket) by a second md5 fold, uniform in [-1, 1]: a
      reproducible stand-in with identical plumbing and a cross-engine
      DuckDB twin, used by tests and the driver gate.

    Seeded mode never leaves codegen (transform + aggregate over the
    gram array — zero shuffles, zero joins); weights mode is
    explode -> broadcast-join -> groupBy, still one corpus pass."""
    grams = _word_grams(text_col)
    if weights_df is None:
        bucket = lambda g: F.pmod(_md5_fold60(g), F.lit(1 << n_bits))  # noqa: E731
        # integer milli-weights in [-1000, 1000]: the per-doc SUM is
        # exact in both engines, so the mean (one division) is
        # bit-identical cross-engine — float accumulation order can't
        # perturb the fixed-point output
        w = lambda g: F.pmod(_md5_fold60(  # noqa: E731
            F.concat(F.lit(f"w:{seed}:"), bucket(g).cast("string"))),
            F.lit(2001)) - 1000
        s = F.aggregate(grams, F.lit(0).cast("long"),
                        lambda acc, g: acc + w(g))
        n = F.size(grams)
        mean = F.when(n > 0, s.cast("double")
                      / (F.lit(1000.0) * n)).otherwise(F.lit(0.0))
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
        return df.select(F.col(id_col).alias("doc_id"),
                         n.cast("long").alias("n_feats"),
                         x1e4(prob).alias("prob_x1e4"))
    feats = df.select(F.col(id_col).alias("doc_id"),
                      F.explode_outer(grams).alias("g"))
    feats = feats.withColumn(
        "bucket", F.when(F.col("g").isNotNull(),
                         F.pmod(_md5_fold60(F.col("g")),
                                F.lit(1 << n_bits))))
    scored = feats.join(F.broadcast(weights_df), "bucket", "left")
    agg = scored.groupBy("doc_id").agg(
        F.count("g").alias("n_feats"),
        F.coalesce(F.avg("weight"), F.lit(0.0)).alias("_mean"))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.when(
        F.col("n_feats") > 0, F.col("_mean")).otherwise(F.lit(0.0))))
    return agg.select("doc_id", F.col("n_feats").cast("long").alias("n_feats"),
                      x1e4(prob).alias("prob_x1e4"))


def paragraph_dup_stats(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Cross-document paragraph-level exact dedup stats (the C4 "three-
    sentence span" / paragraph dedup family): split each doc on blank
    lines, hash paragraphs with the cross-engine md5 fold, count each
    hash corpus-wide, and report per doc -> (doc_id, n_paras,
    n_dup_paras, dup_ratio_x1e4) where a paragraph is "dup" when its
    hash occurs in MORE THAN ONE document.

    Plan: explode paragraphs -> distinct (doc, hash) -> per-hash
    doc-frequency groupBy -> per-doc rollup. Two shuffles on the
    paragraph stream, both on hashed 60-bit keys (never paragraph
    text), map-side combined — the same shape as exact doc dedup, one
    level finer."""
    paras = F.filter(
        F.transform(F.split(F.col(text_col), r"\n\s*\n"),
                    lambda p: F.trim(p)),
        lambda p: p != "")
    pe = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode_outer(paras).alias("para"))
          .withColumn("ph", F.when(F.col("para").isNotNull(),
                                   _md5_fold60(F.col("para")))))
    per_doc_hash = (pe.groupBy("doc_id", "ph")
                    .agg(F.count("para").alias("_n")))
    hash_docs = (per_doc_hash.filter(F.col("ph").isNotNull())
                 .groupBy("ph")
                 .agg(F.count(F.lit(1)).alias("_docs")))
    joined = per_doc_hash.join(hash_docs, "ph", "left")
    out = (joined.groupBy("doc_id")
           .agg(F.sum(F.when(F.col("ph").isNotNull(), F.col("_n"))
                      .otherwise(F.lit(0))).alias("n_paras"),
                F.sum(F.when(F.col("_docs") > 1, F.col("_n"))
                      .otherwise(F.lit(0))).alias("n_dup_paras")))
    ratio = F.when(F.col("n_paras") > 0,
                   F.col("n_dup_paras").cast("double")
                   / F.col("n_paras").cast("double")).otherwise(F.lit(0.0))
    return out.select("doc_id",
                      F.col("n_paras").cast("long").alias("n_paras"),
                      F.col("n_dup_paras").cast("long").alias("n_dup_paras"),
                      x1e4(ratio).alias("dup_ratio_x1e4"))


def curation_verdict(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text", min_words: int = 5,
                     max_dup_line_frac: float = 0.30,
                     max_top2_char_frac: float = 0.20,
                     rep_min_words: int = 20,
                     allow_pii: bool = False) -> DataFrame:
    """The composed keep/drop decision a curation pipeline actually
    ships: C4 page flags + Gopher repetition + PII triage evaluated
    together -> (doc_id, keep, reasons array<string>), with EVERY
    failing rule named (never a silent drop — the same explicitness
    rule the engine's quarantine paths follow).

    Reasons: ``c4_lorem`` / ``c4_brace`` / ``c4_policy`` /
    ``too_short`` / ``dup_lines`` / ``repetitive_2gram`` / ``pii``.
    The dominant-2gram rule only applies to docs with at least
    ``rep_min_words`` words — on shorter docs the single bigram IS a
    large share of the text and the statistic is meaningless (Gopher's
    repetition thresholds are calibrated for full web pages).

    Plan: the flag ops each scan the corpus once (C4 and PII are pure
    projections; repetition adds its gram explode+count), then two
    doc_id equi-joins assemble the verdict — at 100 TB these co-locate
    when the corpus is bucketed by doc_id, and the whole composition
    stays a fixed number of passes independent of rule count."""
    c4 = c4_quality_flags(df, id_col=id_col, text_col=text_col,
                          min_words=min_words)
    rep = repetition_stats(df, id_col=id_col, text_col=text_col,
                           top_ns=(2,), dup_ns=())
    pii = pii_stats(df, id_col=id_col, text_col=text_col)
    j = (c4.join(rep.select("doc_id", "dup_line_frac_x1e4",
                            "top2_char_frac_x1e4"), "doc_id")
         .join(pii.select("doc_id", "has_pii"), "doc_id"))
    checks = [
        ("c4_lorem", F.col("has_lorem")),
        ("c4_brace", F.col("has_brace")),
        ("c4_policy", F.col("has_policy")),
        ("too_short", F.col("n_words") < F.lit(int(min_words))),
        ("dup_lines", F.col("dup_line_frac_x1e4")
         > F.lit(int(max_dup_line_frac * 10000))),
        ("repetitive_2gram",
         (F.col("n_words") >= F.lit(int(rep_min_words)))
         & (F.col("top2_char_frac_x1e4")
            > F.lit(int(max_top2_char_frac * 10000)))),
    ]
    if not allow_pii:
        checks.append(("pii", F.col("has_pii")))
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None))
                  for name, cond in checks]),
        lambda x: x.isNotNull())
    return (j.select("doc_id", reasons.alias("reasons"))
            .withColumn("keep", F.size("reasons") == 0)
            .select("doc_id", "keep", "reasons"))
