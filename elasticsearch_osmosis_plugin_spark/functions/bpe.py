"""BPE tokenizer training + encoding over the corpus — the
training-data-pipeline op that sizes LLM datasets in real tokens
instead of whitespace splits.

Classic byte-pair encoding (Sennrich et al. 2016) factors exactly the
way a 100 TB corpus needs: the only corpus-sized pass is a WORD COUNT
(one tokenize + groupBy shuffle — the same shape as the index build's
dictionary stage), because BPE merges are a function of the
word-type -> frequency dictionary alone, not of the corpus. The
dictionary is capped to the top ``max_word_types`` types (count desc,
word asc — deterministic), bounding driver memory regardless of
corpus size; merges then run driver-side with the standard
incremental pair-count update (only words containing the merged pair
are touched per iteration).

Encoding goes back out distributed: an Arrow-batched pandas UDF
segments words with the learned merge ranks (greedy lowest-rank, the
GPT-2 rule), memoizing per-word segmentations across the batch — web
text repeats words heavily, so the amortized cost per token is a dict
hit.

Determinism: ties in pair frequency break on the lexicographically
smallest pair; the cap and every count are exact. Same corpus + same
params -> byte-identical merge table on any cluster size.

End-of-word marker: ``</w>`` appended to each word's last symbol
(the original BPE convention), so decode is a concat + marker strip
— round-trip identity is tested.
"""
from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from .tokenizer import tokenize_expr

EOW = "</w>"


# ------------------------------------------------------------- word counts

def word_counts(df: DataFrame, text_col: str = "text",
                analyzer: str = "simple",
                max_word_types: int = 100_000) -> list[tuple[str, int]]:
    """Distributed word-type counts, capped deterministically.

    The ONLY corpus-sized stage of BPE training: tokenize in Catalyst
    (codegen), explode, one groupBy shuffle with map-side partials,
    then a k-bounded TakeOrdered of the top types.
    """
    wc = (df.select(F.explode(tokenize_expr(text_col, analyzer))
                    .alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    rows = (wc.orderBy(F.desc("c"), F.asc("w"))
            .limit(max_word_types).collect())
    return [(r["w"], int(r["c"])) for r in rows]


# ---------------------------------------------------------- driver merges

def learn_bpe(word_freq: Iterable[tuple[str, int]],
              n_merges: int) -> list[tuple[str, str]]:
    """Sennrich BPE over a word->count dictionary with incremental
    pair-count maintenance. Deterministic: ties on count break on the
    smaller pair. Returns the ordered merge table."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_freq:
        if not w:
            continue
        words.append(list(w[:-1]) + [w[-1] + EOW])
        freqs.append(int(c))

    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, sym in enumerate(words):
        f = freqs[i]
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += f
            where[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt <= 0:
            break
        merges.append((a, b))
        new_sym = a + b
        touched = list(where.get((a, b), ()))
        # per touched word: retract ALL its old pairs, apply the merge,
        # add back ALL its new pairs — O(|word|) like the
        # neighbor-delta update, without its overlapping-merge edge
        # cases (consecutive a·b·a·b runs corrupt neighbor deltas)
        for i in touched:
            sym, f = words[i], freqs[i]
            for pr in zip(sym, sym[1:]):
                pair_counts[pr] -= f
                if pair_counts[pr] <= 0:
                    pair_counts.pop(pr, None)
                loc = where.get(pr)
                if loc is not None:
                    loc.discard(i)
                    if not loc:
                        where.pop(pr, None)
            j, out = 0, []
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == a and sym[j + 1] == b:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            for pr in zip(out, out[1:]):
                pair_counts[pr] += f
                where[pr].add(i)
        pair_counts.pop((a, b), None)
        where.pop((a, b), None)
    return merges


# --------------------------------------------------------------- encoding

def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging (the GPT-2 encode rule): repeatedly
    merge the pair with the smallest learned rank until none apply."""
    if not word:
        return []
    sym = list(word[:-1]) + [word[-1] + EOW]
    while len(sym) > 1:
        ranked = [(ranks.get((a, b)), k)
                  for k, (a, b) in enumerate(zip(sym, sym[1:]))]
        ranked = [(r, k) for r, k in ranked if r is not None]
        if not ranked:
            break
        _, k = min(ranked)
        sym = sym[:k] + [sym[k] + sym[k + 1]] + sym[k + 2:]
    return sym


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", analyzer: str = "simple",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Corpus -> array<string> BPE tokens, Arrow-batched, per-word
    segmentation memoized across each batch."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(ws):
            if ws is None:
                return []
            out = []
            for w in ws:
                seg = cache.get(w)
                if seg is None:
                    seg = segment_word(w, ranks)
                    cache[w] = seg
                out.extend(seg)
            return out

        return words.apply(run)

    return df.withColumn(out_col,
                         enc(tokenize_expr(text_col, analyzer)))


def bpe_token_counts(df: DataFrame, merges: list[tuple[str, str]],
                     id_col: str = "doc_id", text_col: str = "text",
                     analyzer: str = "simple") -> DataFrame:
    """(doc_id, n_tokens) under the learned vocabulary — the dataset-
    sizing number a mixture/packing plan actually needs."""
    return (bpe_encode(df, merges, text_col, analyzer)
            .select(id_col, F.size("bpe_tokens").alias("n_tokens")))


def train_bpe(df: DataFrame, *, vocab_merges: int = 1000,
              text_col: str = "text", analyzer: str = "simple",
              max_word_types: int = 100_000) -> list[tuple[str, str]]:
    """End-to-end: distributed word count -> driver merges."""
    return learn_bpe(word_counts(df, text_col, analyzer, max_word_types),
                     vocab_merges)
