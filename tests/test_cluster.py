"""Connected-components clustering + decontamination.

The CC oracle is a plain Python union-find — any disagreement on any
random graph is a bug in the star contraction."""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.functions.cluster import (
    connected_components,
    duplicate_clusters,
)
from elasticsearch_osmosis_plugin_spark.functions.dedupe import contamination


def _union_find_labels(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _cc_spark(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    want = _union_find_labels(edges, nodes)
    assert _cc_spark(spark, edges) == want


def test_cc_long_chain(spark):
    """Path graph: diameter >> O(log n) rounds — star contraction must
    still collapse it to one cluster rooted at the min."""
    edges = [(i, i + 1) for i in range(40)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0} and len(got) == 41


def test_cc_empty_and_selfloop(spark):
    pairs = spark.createDataFrame([(7, 7)], "doc_a long, doc_b long")
    assert connected_components(pairs).collect() == []


def test_duplicate_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 2)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_keep"])
            for r in duplicate_clusters(docs, pairs).collect()}
    assert rows == {0: (0, True), 1: (1, True), 2: (1, False), 3: (3, True),
                    4: (1, False), 5: (5, True)}


def test_contamination(spark):
    train = spark.createDataFrame([
        (1, "a b c d e f"),        # shares the eval doc's text wholesale
        (2, "a b c x y z"),        # partial overlap: 1 of 4 shingles
        (3, "p q r s t u"),        # disjoint
        (4, "tiny"),               # < n tokens: no shingles, not scored
    ], "doc_id long, text string")
    ev = spark.createDataFrame([(100, "a b c d e f")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in contamination(train, ev, n=3).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_hit"] == rows[1]["n_shingles"] == 4
    assert rows[1]["contaminated"] is True
    assert (rows[2]["n_shingles"], rows[2]["n_hit"]) == (4, 1)
    assert rows[2]["contaminated"] is False
    assert rows[3]["n_hit"] == 0 and rows[3]["overlap_x1e4"] == 0


def test_repetition_stats(spark):
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        repetition_stats,
    )

    docs = spark.createDataFrame([
        # 4 lines, "dup dup" twice; tokens: a b a b a b (18 chars? a/b
        # 1 char each: tok_chars=6); top bigram "a b" count 3, chars/gram 2
        (1, "a b a b a b"),
        (2, "x\ny\nx\nz"),          # lines x,y,x,z: 2/4 dup, chars 2/4
        (3, "q w e r t y u"),       # no repetition
        (4, ""),                    # degenerate
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: top2 = 3 occurrences * 2 chars / 6 = 1.0
    assert rows[1]["top2_char_frac_x1e4"] == 10000
    # doc 1: dup5 grams "a b a b a" x1 + "b a b a b" x1 -> none dup
    assert rows[1]["dup5_char_frac_x1e4"] == 0
    assert rows[2]["dup_line_frac_x1e4"] == 5000
    assert rows[2]["dup_line_char_frac_x1e4"] == 5000
    assert rows[3]["dup_line_frac_x1e4"] == 0
    assert rows[3]["top2_char_frac_x1e4"] < 10000
    assert rows[4]["top2_char_frac_x1e4"] == 0
    assert rows[4]["dup_line_frac_x1e4"] == 0


def test_ngram_jaccard_prefix_equals_naive(spark):
    """Prefix filtering is an exact optimization: identical pair set
    and scores as the shared-shingle plan on a dup-heavy corpus."""
    from elasticsearch_osmosis_plugin_spark.corpus import generate_corpus_df
    from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = generate_corpus_df(spark, seed=5, n=120).withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit"))
    # inject true near-dups: clone a slice with a one-token prefix edit
    clones = (docs.limit(15)
              .withColumn("doc_id", F.col("doc_id") + 1)
              .withColumn("content", F.concat(F.lit("edited "),
                                              F.col("content"))))
    corpus = docs.unionByName(clones)
    naive = {(r["doc_a"], r["doc_b"]): r["jaccard_x1e4"]
             for r in ngram_jaccard_pairs(
                 corpus, n=3, threshold=0.4, text_col="content").collect()}
    pref = {(r["doc_a"], r["doc_b"]): r["jaccard_x1e4"]
            for r in ngram_jaccard_pairs_prefix(
                corpus, n=3, threshold=0.4, text_col="content").collect()}
    assert naive == pref and len(naive) >= 15


def test_pii_stats_and_redact(spark):
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        pii_redact,
        pii_stats,
    )

    docs = spark.createDataFrame([
        (1, "mail me at jo.doe+x@example.co.uk or 10.0.0.1"),
        (2, "call +1 (415) 555-0123 now"),
        (3, "clean text, no pii here"),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"]) == (1, 1)
    assert rows[1]["has_pii"] and rows[2]["has_pii"]
    assert rows[2]["n_phone"] == 1
    assert not rows[3]["has_pii"]
    red = {r["doc_id"]: r["text"] for r in pii_redact(docs).collect()}
    assert "<EMAIL>" in red[1] and "<IPV4>" in red[1]
    assert "example" not in red[1]
    assert "<PHONE>" in red[2] and "555" not in red[2]
    assert red[3] == "clean text, no pii here"


def test_contamination_broadcast_plan(spark):
    train = spark.createDataFrame([(i, f"w{i} w{i+1} w{i+2} w{i+3}")
                                   for i in range(20)], "doc_id long, text string")
    ev = train.filter(F.col("doc_id") < 3)
    plan = contamination(train, ev, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_deterministic_sampling(spark):
    """Sampling is a pure key-hash filter: reruns and repartitionings
    reproduce the same rows; nested same-seed samples compose; the
    train/eval split is disjoint and exhaustive."""
    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        deterministic_sample,
        stratified_mixture,
        train_eval_split,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.concat(F.lit("l"), F.col("doc_id") % 4))
    half = deterministic_sample(df, 0.5)
    ids = sorted(r["doc_id"] for r in half.collect())
    again = sorted(r["doc_id"] for r in
                   deterministic_sample(df.repartition(7), 0.5).collect())
    assert ids == again and 800 < len(ids) < 1200
    # nested same-seed sample is idempotent; lower rate is a subset
    assert sorted(r["doc_id"] for r in
                  deterministic_sample(half, 0.5).collect()) == ids
    quarter = set(r["doc_id"] for r in deterministic_sample(df, 0.25).collect())
    assert quarter <= set(ids)

    mix = stratified_mixture(df, {"l0": 1.0, "l1": 0.0}, stratum_col="lang",
                             default_rate=0.5)
    by_lang = {r["lang"]: r["n"] for r in
               mix.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang["l0"] == 500 and "l1" not in by_lang
    assert 150 < by_lang.get("l2", 0) < 350

    train, ev = train_eval_split(df, eval_frac=0.2)
    t = {r["doc_id"] for r in train.collect()}
    e = {r["doc_id"] for r in ev.collect()}
    assert t.isdisjoint(e) and len(t) + len(e) == 2000
    assert 250 < len(e) < 550

    import pytest as _pytest
    with _pytest.raises(ValueError):
        deterministic_sample(df, 1.5)


def test_pack_sequences(spark):
    """Global packing matches the python fold; the partitioned scale
    path assigns every doc exactly once with per-partition-contiguous
    bins and per-bin totals <= budget + max doc."""
    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        pack_sequences,
        pack_sequences_partitioned,
    )

    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["bin_id"], r["offset"])
           for r in pack_sequences(df, 128).collect()}
    cum = 0
    for i, n in rows:
        assert got[i] == (cum // 128, cum), i
        cum += n

    packed = pack_sequences_partitioned(df.repartition(4), 128).collect()
    assert sorted(r["doc_id"] for r in packed) == [i for i, _ in rows]
    by_bin: dict = {}
    for r in packed:
        by_bin.setdefault(r["bin_id"], []).append(r)
    max_doc = max(n for _, n in rows)
    for b, docs in by_bin.items():
        total = sum(r["n_tokens"] for r in docs)
        # a bin holds whatever STARTS in its window: total tokens can
        # overrun the budget only by the final straddling doc
        assert total <= 128 + max_doc, (b, total)
        offs = sorted(r["offset"] for r in docs)
        spans = {r["offset"]: r["n_tokens"] for r in docs}
        for a, c in zip(offs, offs[1:]):   # contiguous within the bin
            assert a + spans[a] == c


def test_chunk_documents(spark):
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        chunk_documents,
    )

    long_text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame(
        [(0, long_text), (1, "a b c"), (2, "")],
        "doc_id long, text string")
    got = chunk_documents(df, 10, overlap=2).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts at 0, 8, 16 (stride 8) over 25 tokens — the
    # sequence bound (n - overlap) stops before a degenerate tail
    # chunk while still covering every token
    c0 = [r["chunk_text"].split() for r in by_doc[0]]
    assert [len(c) for c in c0] == [10, 10, 9]
    for a, b in zip(c0, c0[1:]):        # overlap carries context
        assert a[-2:] == b[:2] or len(a) < 10
    assert {t for c in c0 for t in c} == set(long_text.split())
    assert [r["chunk_text"] for r in by_doc[1]] == ["a b c"]
    assert 2 not in by_doc              # empty doc -> no chunks
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, 10, overlap=10)


def test_unigram_logprob_score(spark):
    """Docs made of rare tokens score strictly higher NLL than docs of
    the corpus's most common token; reference-vocab mode gives OOV the
    smoothed floor."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        unigram_logprob_score,
    )

    rows = [(i, "common " * 10) for i in range(9)] + [(9, "rareword unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["nll_x1e4"] for r in
           unigram_logprob_score(df).collect()}
    assert got[9] > got[0] > 0
    vocab = spark.createDataFrame([("common", 100)], "term string, cnt long")
    ref = {r["doc_id"]: r["nll_x1e4"] for r in
           unigram_logprob_score(df, vocab_df=vocab).collect()}
    assert ref[9] > ref[0]              # OOV floor > in-vocab prob


def test_temperature_rates_and_mixture(spark):
    """Alpha-sampling rule: alpha=1 keeps everything, alpha=0 targets
    a uniform mixture (smallest stratum fully kept), budget scales
    down, and the realized mixture moves toward uniform."""
    import pytest as _pytest

    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        temperature_mixture,
        temperature_rates,
    )

    sizes = {"en": 8000, "fr": 1000, "de": 1000}
    r1 = temperature_rates(sizes, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    r0 = temperature_rates(sizes, alpha=0.0)
    assert abs(r0["fr"] - 1.0) < 1e-12 and abs(r0["de"] - 1.0) < 1e-12
    assert abs(r0["en"] - 1000 / 8000) < 1e-12   # uniform target
    rb = temperature_rates(sizes, alpha=0.0, budget=0.15)
    kept = sum(rb[s] * n for s, n in sizes.items()) / sum(sizes.values())
    assert abs(kept - 0.15) < 1e-9
    with _pytest.raises(ValueError):
        temperature_rates(sizes, alpha=1.5)

    from pyspark.sql import functions as F
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise(
            F.when(F.col("id") % 10 == 8, "fr").otherwise("de"))
        .alias("lang"))
    out = temperature_mixture(df, stratum_col="lang", alpha=0.3)
    mix = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    nat = {"en": 2400, "fr": 300, "de": 300}
    # small strata kept nearly whole, big stratum cut hard
    assert mix["fr"] > 0.9 * nat["fr"] and mix["de"] > 0.9 * nat["de"]
    assert mix["en"] < 0.6 * nat["en"]
    # deterministic: rerun identical
    again = {r["lang"]: r["n"] for r in
             temperature_mixture(df, stratum_col="lang", alpha=0.3)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == mix


def test_dsir_weights_and_sample(spark):
    """DSIR log-weights match a single-process recompute (hashed
    unigram+bigram buckets, Laplace smoothing), target-like docs
    outscore off-distribution ones, and the Gumbel top-k draw is
    deterministic under repartitioning."""
    import hashlib
    import math

    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        dsir_log_weights,
        dsir_sample,
    )

    tgt_rows = [(i, "spark query join window " * 5) for i in range(10)]
    raw_rows = ([(100 + i, "spark query join filter " * 5) for i in range(5)]
                + [(200 + i, "banana apple pear kiwi " * 5) for i in range(5)])
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    B = 64
    got = {r["doc_id"]: r["logw"] for r in
           dsir_log_weights(raw, tgt, n_buckets=B).collect()}

    def grams(text):
        t = text.lower().split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[1:16], 16) % B

    ct_t, ct_r = [0.0] * B, [0.0] * B
    for _, tx in tgt_rows:
        for g in grams(tx):
            ct_t[bucket(g)] += 1
    for _, tx in raw_rows:
        for g in grams(tx):
            ct_r[bucket(g)] += 1
    tt, tr = sum(ct_t), sum(ct_r)
    lr = [math.log((ct_t[b] + 1) / (tt + B)) - math.log((ct_r[b] + 1) / (tr + B))
          for b in range(B)]
    for did, tx in raw_rows:
        want = 0.0
        for g in grams(tx):
            want += lr[bucket(g)]
        assert abs(got[did] - want) < 1e-9, did
    # target-like raw docs must outscore the off-distribution ones
    assert min(got[d] for d in range(100, 105)) > \
        max(got[d] for d in range(200, 205))
    s1 = dsir_sample(raw, tgt, 5, n_buckets=B, seed=3).collect()
    s2 = dsir_sample(raw.repartition(7), tgt, 5, n_buckets=B, seed=3).collect()
    assert [(r["doc_id"], r["key"]) for r in s1] == \
        [(r["doc_id"], r["key"]) for r in s2]
    assert len(s1) == 5


def test_shuffle_order_permutation(spark):
    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        shuffle_order,
    )

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)],
                               "doc_id long, text string")
    out = shuffle_order(df, seed=1).collect()
    # a permutation: every position exactly once, all rows kept
    assert sorted(r["shuffle_pos"] for r in out) == list(range(200))
    assert {r["doc_id"] for r in out} == set(range(200))
    # deterministic under repartitioning
    again = shuffle_order(df.repartition(7), seed=1).collect()
    assert {(r["doc_id"], r["shuffle_pos"]) for r in again} \
        == {(r["doc_id"], r["shuffle_pos"]) for r in out}
    # a different seed is a different permutation
    other = shuffle_order(df, seed=2).collect()
    assert {(r["doc_id"], r["shuffle_pos"]) for r in other} \
        != {(r["doc_id"], r["shuffle_pos"]) for r in out}


def test_temperature_mixture_token_weighted(spark):
    """weight_col switches stratum size to token sums: a stratum of
    few huge docs samples like one of many small docs."""
    from elasticsearch_osmosis_plugin_spark.functions.sampling import (
        temperature_mixture,
        temperature_rates,
    )

    rows = [(i, "big", 1000) for i in range(10)] \
        + [(100 + i, "small", 25) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    # token sizes: big=10k, small=10k -> equal strata under weights;
    # doc counts are 10 vs 400 -> wildly different without weights
    kept_w = temperature_mixture(df, stratum_col="lang", alpha=0.0,
                                 weight_col="n_tok")
    by = {r["lang"]: r["n"] for r in
          kept_w.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # equal token mass -> both rates 1.0 -> everything kept
    assert by == {"big": 10, "small": 400}
    # unweighted at alpha=0 targets uniform DOC mixture: the big-doc
    # stratum (fewer docs) keeps all, the small-doc stratum subsamples
    kept = temperature_mixture(df, stratum_col="lang", alpha=0.0)
    byu = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert byu["big"] == 10 and byu["small"] < 400
    rates = temperature_rates({"big": 10, "small": 400}, alpha=0.0)
    assert rates["big"] == 1.0 and abs(rates["small"] - 10 / 400) < 1e-12


def test_bigram_logprob_score(spark):
    """Hand-computed Jelinek-Mercer golden on a 3-doc corpus; fluent
    (frequent-bigram) text scores lower NLL than a shuffled variant;
    <2-token docs drop."""
    import math

    from collections import Counter

    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        bigram_logprob_score,
    )
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py

    rows = [(0, "the cat sat on the mat"),
            (1, "the cat sat on the mat again"),
            (2, "mat the on sat cat the"),
            (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lam = 0.8
    toks = {d: tokenize_py(t, "simple") for d, t in rows}
    uni = Counter(w for ts in toks.values() for w in ts)
    bi = Counter((ts[i], ts[i + 1]) for ts in toks.values()
                 for i in range(len(ts) - 1))
    ctx = Counter()
    for (v, _w), c in bi.items():
        ctx[v] += c
    n, vsz = sum(uni.values()), len(uni)

    def nll(ts):
        out = []
        for i in range(len(ts) - 1):
            v, w = ts[i], ts[i + 1]
            p = (lam * (bi[(v, w)] / ctx[v] if ctx[v] else 0.0)
                 + (1 - lam) * (uni[w] + 1.0) / (n + vsz))
            out.append(-math.log2(p))
        return sum(out) / len(out)

    got = {r["doc_id"]: (r["n_events"], r["nll_x1e4"]) for r in
           bigram_logprob_score(df, lam=lam).collect()}
    assert 3 not in got                       # <2 tokens -> no events
    for d in (0, 1, 2):
        want = int(math.floor(nll(toks[d]) * 1e4 + 0.5))
        assert got[d] == (len(toks[d]) - 1, want), d
    assert got[0][1] < got[2][1]              # fluent < shuffled


def test_duplicate_clusters_keep_best(spark):
    """keep_by keeps the max-valued member (doc_id tiebreak);
    singletons always keep; exactly one keeper per cluster."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
        "doc_id long, quality long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 1)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_keep"]) for r in
           duplicate_clusters(docs, pairs,
                              keep_by=F.col("quality")).collect()}
    # cluster {1,2,3,4}: max quality 30 tied between 2 and 3 -> min id 2
    assert out[2] == (1, True)
    assert out[1][1] is False and out[3][1] is False and out[4][1] is False
    assert out[9] == (9, True)            # singleton keeps itself
    assert sum(1 for _, k in out.values() if k) == 2
