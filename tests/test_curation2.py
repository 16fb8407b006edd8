"""URL dedup, CCNet buckets, C4 flags, bloom incremental dedup, int8
quantization — golden/property tests."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.functions.analysis import (
    c4_quality_flags,
    ccnet_buckets,
)
from elasticsearch_osmosis_plugin_spark.functions.dedupe import (
    bloom_build,
    bloom_might_contain,
    bloom_new_docs,
    url_dup_groups,
    url_normalize,
)
from elasticsearch_osmosis_plugin_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_quantized,
    quantize_embeddings,
    quantize_vec_py,
)


def test_url_normalize_rules(spark):
    cases = [
        ("HTTPS://WWW.Ex.COM/A/b/?utm_source=t&q=1#frag", "ex.com/a/b?q=1"),
        ("http://ex.com/a/", "ex.com/a"),
        ("ex.com/a?utm_campaign=x&fbclid=1&gclid=2", "ex.com/a"),
        ("https://sub.ex.com/p?q=2&ref=tw", "sub.ex.com/p?q=2"),
        ("www.ex.com", "ex.com"),
        ("ex.com/a?Q=UP", "ex.com/a?q=up"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["n"] for r in
           df.select(url_normalize("url").alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_url_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "https://ex.com/a?utm_source=x"),
         (2, "EX.COM/a/"),
         (3, "http://www.ex.com/a#top"),
         (4, "ex.com/b")],
        "doc_id long, url string")
    out = url_dup_groups(df, "url").collect()
    assert len(out) == 1
    assert out[0]["norm_url"] == "ex.com/a"
    assert out[0]["n_docs"] == 3 and out[0]["keep_id"] == 1
    assert out[0]["doc_ids"] == [1, 2, 3]


def test_ccnet_buckets_order_and_sizes(spark):
    # fluent docs repeat common tokens; tail doc is all-rare tokens
    rows = [(i, "the cat sat on the mat " * 3) for i in range(6)]
    rows += [(6, "zqx wvu ptk"), (7, "the cat sat zqx on mat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bucket"]
           for r in ccnet_buckets(df, n_buckets=2).collect()}
    assert out[6] == 2          # the all-rare doc lands in the tail
    assert sum(1 for b in out.values() if b == 1) == 4  # equal bands


def test_c4_quality_flags(spark):
    df = spark.createDataFrame(
        [(1, "A good line ends well.\nAnother proper line!"),
         (2, "lorem ipsum dolor sit amet and then more words"),
         (3, "function() { return 1; } extra words here too"),
         (4, "We use cookies. Please accept our cookie policy now."),
         (5, "too short"),
         (6, "no terminal punctuation here but plenty of words")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_quality_flags(df).collect()}
    assert out[1]["keep"] and out[1]["terminal_ratio_x1e4"] == 10000
    assert out[2]["has_lorem"] and not out[2]["keep"]
    assert out[3]["has_brace"] and not out[3]["keep"]
    assert out[4]["has_policy"] and not out[4]["keep"]
    assert not out[5]["keep"] and out[5]["n_words"] == 2
    assert out[6]["keep"] and out[6]["terminal_ratio_x1e4"] == 0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    corpus = spark.range(0, 2000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("fp"))
    packed = bloom_build(corpus, "fp", n_bits=1 << 16, k=4, seed=1)
    # every corpus member must test positive (no false negatives)
    hits = corpus.filter(
        bloom_might_contain(spark, packed, "fp", 1 << 16, 4, 1)).count()
    assert hits == 2000
    # new keys: FP rate stays near theory ((1 - e^{-kn/m})^k ~ 0.3%)
    fresh = spark.range(10_000, 14_000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("fp"))
    fp = fresh.filter(
        bloom_might_contain(spark, packed, "fp", 1 << 16, 4, 1)).count()
    assert fp / 4000 < 0.02
    # bloom_new_docs keeps only genuinely-new rows (minus FPs)
    batch = corpus.limit(50).unionByName(fresh)
    new = bloom_new_docs(spark, batch, corpus, "fp",
                         n_bits=1 << 16, k=4, seed=1)
    got = set(r["fp"] for r in new.collect())
    assert all(g.startswith("doc1") for g in got)  # ids 10000..13999
    assert len(got) >= 4000 - fp - 1


def test_quantize_grid_and_recall(spark, embeddings_df=None):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>")
    dfq = quantize_embeddings(df)
    rows = dfq.collect()
    for r in rows[:20]:
        v = vecs[r["vec_id"]]
        q, scale = quantize_vec_py(v)
        assert r["qvec"] == q  # engine grid == python twin grid
        assert abs(r["scale"] - scale) < 1e-12
        assert max(abs(t) for t in r["qvec"]) <= 127
    qv = [float(x) for x in rng.standard_normal(16)]
    exact = [r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()]
    approx = [r["vec_id"]
              for r in cosine_topk_quantized(dfq, qv, k=10).collect()]
    # int8 grid error is tiny at dim 16: expect high top-10 agreement
    assert len(set(exact) & set(approx)) >= 8


def test_hashed_ngram_classifier_modes(spark):
    """Seeded mode recomputes exactly; weights mode applies a trained
    model through the same hashing; empty text scores sigmoid(0)."""
    import hashlib

    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        hashed_ngram_classifier,
    )

    docs = [(0, "good clean prose here"), (1, "spam spam spam buy now"),
            (2, ""), (3, "one")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def fold(s):
        return int(hashlib.md5(s.encode()).hexdigest()[1:16], 16)

    def grams(t):
        toks = [x for x in t.lower().split() if x]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    got = {r["doc_id"]: r for r in
           hashed_ngram_classifier(df, seed=7, n_bits=18).collect()}
    for d, t in docs:
        gs = grams(t)
        s = sum(fold(f"w:7:{fold(g) % (1 << 18)}") % 2001 - 1000 for g in gs)
        mean = s / (1000.0 * len(gs)) if gs else 0.0
        prob = 1.0 / (1.0 + math.exp(-mean))
        assert got[d]["n_feats"] == len(gs)
        assert got[d]["prob_x1e4"] == math.floor(prob * 10000.0 + 0.5)
    assert got[2]["prob_x1e4"] == 5000  # sigmoid(0)

    # weights mode: a model that loves "spam" features
    wrows = [(fold("spam") % (1 << 18), 3.0),
             (fold("spam spam") % (1 << 18), 2.0)]
    wdf = spark.createDataFrame(wrows, "bucket long, weight double")
    got_w = {r["doc_id"]: r["prob_x1e4"] for r in
             hashed_ngram_classifier(df, weights_df=wdf).collect()}
    assert got_w[1] > got_w[0]  # spammy doc scores higher
    assert got_w[2] == 5000  # no features -> sigmoid(0)
    assert set(got_w) == {0, 1, 2, 3}  # empty doc kept (explode_outer)


def test_paragraph_dup_stats(spark):
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        paragraph_dup_stats,
    )

    docs = [
        (0, "shared para one\n\nunique a\n\nshared para two"),
        (1, "shared para one\n\nunique b"),
        (2, "unique c\n \nshared para two"),  # blank-ish separator line
        (3, "all unique here"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dup_stats(df).collect()}
    assert got[0]["n_paras"] == 3 and got[0]["n_dup_paras"] == 2
    assert got[1]["n_paras"] == 2 and got[1]["n_dup_paras"] == 1
    assert got[2]["n_paras"] == 2 and got[2]["n_dup_paras"] == 1
    assert got[3]["n_paras"] == 1 and got[3]["n_dup_paras"] == 0
    assert got[4]["n_paras"] == 0 and got[4]["dup_ratio_x1e4"] == 0
    assert got[0]["dup_ratio_x1e4"] == math.floor(2 / 3 * 10000 + 0.5)
    # a paragraph repeated WITHIN one doc only is not a cross-doc dup
    df2 = spark.createDataFrame(
        [(0, "x\n\nx"), (1, "y")], "doc_id long, text string")
    got2 = {r["doc_id"]: r for r in paragraph_dup_stats(df2).collect()}
    assert got2[0]["n_dup_paras"] == 0


def test_curation_verdict(spark):
    """Every failing rule named; keep iff no reasons; PII toggle."""
    from elasticsearch_osmosis_plugin_spark.functions.analysis import (
        curation_verdict,
    )

    good = ("A perfectly normal paragraph of text. It has several "
            "sentences. They all differ nicely and end properly.")
    rows = [
        (0, good),
        (1, "lorem ipsum dolor sit amet and then some more words here."),
        (2, "short one"),  # < 5 words
        (3, "contact me at bob@example.com for details about the offer."),
        (4, "la la la la la la la la la la la la la la la la la la."),
        (5, "same line here.\nsame line here.\nsame line here.\nok end."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], sorted(r["reasons"]))
           for r in curation_verdict(df, min_words=5,
                                     rep_min_words=12).collect()}
    assert got[0] == (True, [])
    assert got[1][0] is False and "c4_lorem" in got[1][1]
    assert got[2] == (False, ["too_short"])
    assert got[3][0] is False and "pii" in got[3][1]
    assert got[4][0] is False and "repetitive_2gram" in got[4][1]
    assert got[5][0] is False and "dup_lines" in got[5][1]
    # allow_pii drops the pii rule only
    got_pii = {r["doc_id"]: r["keep"] for r in
               curation_verdict(df, min_words=5, rep_min_words=12,
                                allow_pii=True).collect()}
    assert got_pii[3] is True and got_pii[1] is False
