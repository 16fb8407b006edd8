"""Code-aware tokenizer — the engine's analysis chain.

Reference analog: the ES dynamic template that makes ``tags.name*``
values ``analyzed`` (fulltext) while other tags stay ``not_analyzed``
(``plugin.properties:10-11``). Here the *analyzed* path is a
vectorized pandas UDF; *not_analyzed* columns stay plain Spark columns.

Two analyzers, both available as (a) a vectorized pandas implementation
used inside Arrow batches on executors and (b) a pure-Python twin used
by the rank-identity oracle (SURVEY.md §5). The two MUST be
token-identical — tested property-style in tests/test_tokenizer.py.

- ``simple``: lowercase, split on whitespace runs. Matches the ANSI-SQL
  expressible tokenization used by the DuckDB correctness oracle.
- ``code``: extract [A-Za-z0-9]+ runs (splits snake_case at ``_``),
  then split camelCase boundaries, lowercase. Optional per-lang
  stopword removal.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_osmosis_plugin_spark.corpus import LANG_KEYWORDS

# camelCase boundaries: aB -> a B ; ABc -> A Bc (acronym then word)
_CAMEL_1 = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_CAMEL_2 = re.compile(r"(?<=[A-Z])(?=[A-Z][a-z])")
_LOWER_ALNUM = re.compile(r"[a-z0-9]+")
_WS = re.compile(r"\s+")


def tokenize_py(text: str, analyzer: str = "code",
                lang: str | None = None,
                remove_stopwords: bool = False,
                min_len: int = 1, max_len: int = 64) -> list[str]:
    """Pure-Python twin of the vectorized tokenizer (oracle side)."""
    if text is None:
        return []
    if analyzer == "simple":
        toks = [t for t in _WS.split(text.lower()) if t]
    elif analyzer == "code":
        s = _CAMEL_1.sub(" ", text)
        s = _CAMEL_2.sub(" ", s)
        # lowercase the WHOLE string before extraction (exactly like the
        # vectorized twin) — unicode case-folding can create new ASCII
        # letters (e.g. 'İ'.lower() contains 'i'), so order matters.
        toks = _LOWER_ALNUM.findall(s.lower())
    else:
        raise ValueError(f"unknown analyzer: {analyzer}")
    toks = [t for t in toks if min_len <= len(t) <= max_len]
    if remove_stopwords and lang in LANG_KEYWORDS:
        stop = set(LANG_KEYWORDS[lang])
        toks = [t for t in toks if t not in stop]
    return toks


def tokenize_series(s: pd.Series, analyzer: str = "code",
                    langs: pd.Series | None = None,
                    remove_stopwords: bool = False,
                    min_len: int = 1, max_len: int = 64) -> pd.Series:
    """Vectorized tokenization of a pandas Series of strings -> Series
    of list[str]. Uses pandas C-level .str kernels for the regex work;
    the only Python-level loop is over already-tokenized lists."""
    s = s.fillna("")
    if analyzer == "simple":
        lists = s.str.lower().str.findall(r"\S+")
    elif analyzer == "code":
        x = s.str.replace(_CAMEL_1, " ", regex=True)
        x = x.str.replace(_CAMEL_2, " ", regex=True)
        lists = x.str.lower().str.findall(r"[a-z0-9]+")
    else:
        raise ValueError(f"unknown analyzer: {analyzer}")
    if min_len > 1 or max_len < 64:
        lists = lists.map(lambda ts: [t for t in ts if min_len <= len(t) <= max_len])
    if remove_stopwords and langs is not None:
        stops = {k: set(v) for k, v in LANG_KEYWORDS.items()}
        lists = pd.Series(
            [[t for t in ts if t not in stops.get(lg, ())]
             for ts, lg in zip(lists, langs)],
            index=lists.index,
        )
    return lists


def tokenize_udf(analyzer: str = "code", remove_stopwords: bool = False,
                 min_len: int = 1, max_len: int = 64):
    """pandas UDF: content (+ optional lang) -> array<string> of tokens.

    Scalar-iterator form so per-batch setup (regex compile, stopword
    sets) happens once per task, not per batch.
    """
    if remove_stopwords:
        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _tok(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
            for content, lang in it:
                yield tokenize_series(content, analyzer, lang,
                                      remove_stopwords=True,
                                      min_len=min_len, max_len=max_len)
        return _tok

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok1(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for content in it:
            yield tokenize_series(content, analyzer,
                                  min_len=min_len, max_len=max_len)
    return _tok1


def term_frequencies(tokens: Iterable[str]) -> dict[str, int]:
    """Per-doc term frequency map (oracle + segment-build helper)."""
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    return tf
