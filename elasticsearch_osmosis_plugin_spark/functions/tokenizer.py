"""Code-aware tokenizer — the engine's analysis chain.

Reference analog: the ES dynamic template that makes ``tags.name*``
values ``analyzed`` (fulltext) while other tags stay ``not_analyzed``
(``plugin.properties:10-11``). Here the *analyzed* path is a
vectorized pandas UDF; *not_analyzed* columns stay plain Spark columns.

Two analyzers, available in three implementations that MUST be
token-identical (tested in tests/test_tokenizer.py):
(a) ``tokenize_expr`` — pure Catalyst column expressions (whole-stage
    codegen, zero Python in the hot path) — the default for the build
    and query engines;
(b) a vectorized pandas twin used inside Arrow batches where Python
    is already in the loop (and for the per-language stopword path,
    which needs a per-row set lookup);
(c) a pure-Python twin used by the rank-identity oracle (SURVEY.md §5).

ASCII note: Java regex and DuckDB's RE2 treat ``\\s`` as ASCII
whitespace, while Python's ``re`` is Unicode-aware — so (a) matches
the DuckDB oracle *more* closely than (b)/(c) do. The three agree on
any corpus whose whitespace is ASCII (all engine corpora and test
fixtures); a corpus with U+00A0-style separators must use (b)/(c)
consistently on both the build and query side.

- ``simple``: lowercase, split on whitespace runs. Matches the ANSI-SQL
  expressible tokenization used by the DuckDB correctness oracle.
- ``code``: extract [A-Za-z0-9]+ runs (splits snake_case at ``_``),
  then split camelCase boundaries, lowercase. Optional per-lang
  stopword removal.
- ``whitespace``: the ES whitespace analyzer — split on whitespace
  runs, NO lowercasing (case-sensitive matching, e.g. exact symbol
  search over code).
- ``keyword``: the ES keyword analyzer — the whole input is ONE token,
  untouched (exact-value matching on an "analyzed" field).
- ``english``: the ES/Lucene english analysis-chain analog —
  ``simple`` tokens -> Lucene's classic 33-word English stop set ->
  S-stemmer (Harman 1991: ies->y unless e/a precedes; es->e unless
  a/e/o precedes; s-> unless s/u precedes; first matching suffix rule
  only). Chosen over Porter because every rule is a single regex, so
  the chain stays expressible in Catalyst, pandas, Python AND the
  DuckDB oracle with identical semantics.
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

# Lucene StandardAnalyzer's classic English stop set (public constant,
# org.apache.lucene.analysis.en.EnglishAnalyzer#ENGLISH_STOP_WORDS_SET)
ENGLISH_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

# S-stemmer (Harman 1991) applicability checks: the char before the
# suffix must not be in the exception set; ^.+ keeps a stem of >= 1
# char so no token stems to empty
_SSTEM_IES = re.compile(r"^.+[^ea]ies$")
_SSTEM_ES = re.compile(r"^.+[^aeo]es$")
_SSTEM_S = re.compile(r"^.+[^su]s$")


def s_stem(t: str) -> str:
    """Pure-Python S-stemmer twin: first matching suffix rule decides
    (an 'ies' word that fails its exception check is NOT retried as
    'es'/'s' — Harman's if/elif structure)."""
    if t.endswith("ies"):
        return t[:-3] + "y" if _SSTEM_IES.match(t) else t
    if t.endswith("es"):
        return t[:-1] if _SSTEM_ES.match(t) else t
    if t.endswith("s"):
        return t[:-1] if _SSTEM_S.match(t) else t
    return t


def s_stem_col(t):
    """Catalyst S-stemmer twin (regex-only, codegen-friendly)."""
    return (
        F.when(t.endswith("ies"),
               F.when(t.rlike("^.+[^ea]ies$"),
                      F.regexp_replace(t, "ies$", "y")).otherwise(t))
         .when(t.endswith("es"),
               F.when(t.rlike("^.+[^aeo]es$"),
                      F.regexp_replace(t, "s$", "")).otherwise(t))
         .when(t.endswith("s"),
               F.when(t.rlike("^.+[^su]s$"),
                      F.regexp_replace(t, "s$", "")).otherwise(t))
         .otherwise(t))


def tokenize_py(text: str, analyzer: str = "code",
                lang: str | None = None,
                remove_stopwords: bool = False,
                min_len: int = 1, max_len: int = 64) -> list[str]:
    """Pure-Python twin of the vectorized tokenizer (oracle side)."""
    if text is None:
        return []
    if analyzer == "simple":
        toks = [t for t in _WS.split(text.lower()) if t]
    elif analyzer == "whitespace":
        toks = [t for t in _WS.split(text) if t]
    elif analyzer == "keyword":
        toks = [text] if text else []
    elif analyzer == "code":
        s = _CAMEL_1.sub(" ", text)
        s = _CAMEL_2.sub(" ", s)
        # lowercase the WHOLE string before extraction (exactly like the
        # vectorized twin) — unicode case-folding can create new ASCII
        # letters (e.g. 'İ'.lower() contains 'i'), so order matters.
        toks = _LOWER_ALNUM.findall(s.lower())
    elif analyzer == "english":
        stop = set(ENGLISH_STOPWORDS)
        toks = [s_stem(t) for t in _WS.split(text.lower())
                if t and t not in stop]
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
    elif analyzer == "whitespace":
        lists = s.str.findall(r"\S+")
    elif analyzer == "keyword":
        lists = s.map(lambda t: [t] if t else [])
    elif analyzer == "code":
        x = s.str.replace(_CAMEL_1, " ", regex=True)
        x = x.str.replace(_CAMEL_2, " ", regex=True)
        lists = x.str.lower().str.findall(r"[a-z0-9]+")
    elif analyzer == "english":
        stop = set(ENGLISH_STOPWORDS)
        lists = s.str.lower().str.findall(r"\S+").map(
            lambda ts: [s_stem(t) for t in ts if t not in stop])
    else:
        raise ValueError(f"unknown analyzer: {analyzer}")
    # unconditional, mirroring tokenize_py (65+-char tokens drop at the
    # defaults too — the three twins must agree everywhere)
    lists = lists.map(lambda ts: [t for t in ts if min_len <= len(t) <= max_len])
    if remove_stopwords and langs is not None:
        stops = {k: set(v) for k, v in LANG_KEYWORDS.items()}
        lists = pd.Series(
            [[t for t in ts if t not in stops.get(lg, ())]
             for ts, lg in zip(lists, langs)],
            index=lists.index,
        )
    return lists


def tokenize_expr(col, analyzer: str = "code",
                  min_len: int = 1, max_len: int = 64):
    """Catalyst column-expression tokenizer -> array<string>.

    The JVM hot path: stays inside whole-stage codegen, so corpus
    passes that only need tokens (BM25 scoring branches, term-vector
    builds, dl stats) never cross the Arrow boundary. Token-identical
    to ``tokenize_py`` on ASCII-whitespace text (module docstring).
    Raises ValueError for analyzers/options only the pandas path
    supports (per-language stopword removal) so callers can fall back.
    """
    if analyzer not in ("simple", "code", "english", "whitespace",
                        "keyword"):
        raise ValueError(f"unknown analyzer: {analyzer}")
    if isinstance(col, str):
        col = F.col(col)
    col = F.coalesce(col, F.lit(""))  # tokenize_py(None) == []
    if analyzer == "simple":
        toks = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    elif analyzer == "whitespace":
        toks = F.filter(F.split(col, r"\s+"), lambda t: t != "")
    elif analyzer == "keyword":
        toks = F.when(col == "", F.array().cast("array<string>")) \
            .otherwise(F.array(col))
    elif analyzer == "code":
        x = F.regexp_replace(col, "(?<=[a-z0-9])(?=[A-Z])", " ")
        x = F.regexp_replace(x, "(?<=[A-Z])(?=[A-Z][a-z])", " ")
        toks = F.regexp_extract_all(F.lower(x), F.lit("[a-z0-9]+"), F.lit(0))
    elif analyzer == "english":
        toks = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
        toks = F.filter(toks, lambda t: ~t.isin(*ENGLISH_STOPWORDS))
        toks = F.transform(toks, s_stem_col)
    else:
        raise ValueError(f"unknown analyzer: {analyzer}")
    # ALWAYS applied (tokenize_py applies it unconditionally; skipping
    # at the defaults would diverge from the oracle on 65+-char tokens)
    return F.filter(toks, lambda t: (F.length(t) >= min_len)
                    & (F.length(t) <= max_len))


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


_ANALYZE_OUT = ("array<struct<position:int,token:string,"
                "start_offset:int,end_offset:int>>")


def _offsets_fold(toks, ref):
    """Fold emitted tokens into (position, token, start, end) structs by
    scanning ``ref`` left-to-right with a cursor: each token's start is
    its first occurrence at-or-after the previous token's end, exactly
    the char positions the whitespace-split produced them from (tokens
    are verbatim substrings of ``ref`` for these analyzers). One
    ``aggregate`` expression — stays in whole-stage codegen."""
    def _step(acc, t):
        # 1-based hit within the uncovered suffix -> absolute 0-based
        start = (acc["cur"]
                 + F.position(t, F.substring(ref, acc["cur"] + 1,
                                             F.length(ref))) - 1)
        end = start + F.length(t)
        row = F.struct(
            F.size(acc["out"]).cast("int").alias("position"),
            t.alias("token"),
            start.cast("int").alias("start_offset"),
            end.cast("int").alias("end_offset"))
        return F.struct(end.cast("int").alias("cur"),
                        F.concat(acc["out"], F.array(row)).alias("out"))

    init = F.struct(F.lit(0).cast("int").alias("cur"),
                    F.array().cast(_ANALYZE_OUT).alias("out"))
    return F.aggregate(toks, init, _step, lambda acc: acc["out"])


def token_spans_py(text: str, analyzer: str, min_len: int = 1,
                   max_len: int = 64) -> list[tuple[str, int, int]] | None:
    """ES-offset twin for the REWRITING analyzer chains: (token,
    start_offset, end_offset) per emitted token, with offsets into the
    ORIGINAL input — the char-map ES threads through its token
    filters.

    ``code``: a run of [A-Za-z0-9]+ splits at the two camel
    boundaries; each sub-segment's span is its own chars (the inserted
    zero-width break consumes nothing). ``english``: the stemmer is a
    token FILTER — the token text rewrites but keeps the pre-stem
    token's span, and dropped stopwords emit nothing (exact ES
    semantics). Token text is guaranteed identical to
    ``tokenize_py``'s stream (tested).

    Returns None when lowercasing changes the string length (a
    non-ASCII case-fold like 'İ' -> 'i̇') — the char positions stop
    being well-defined and the caller reports null offsets instead of
    wrong ones."""
    lowered = text.lower()
    if len(lowered) != len(text):
        return None
    out: list[tuple[str, int, int]] = []
    if analyzer == "code":
        def _lo(ch: str) -> bool:       # ASCII classes, matching the
            return "a" <= ch <= "z" or "0" <= ch <= "9"   # _CAMEL_*

        def _up(ch: str) -> bool:       # regexes exactly (not str
            return "A" <= ch <= "Z"     # .isupper(), which is Unicode)

        def _camel_break(i: int) -> bool:
            p, c = text[i - 1], text[i]
            if _lo(p):
                return _up(c)
            return (_up(p) and _up(c) and i + 1 < len(text)
                    and "a" <= text[i + 1] <= "z")

        for m in _LOWER_ALNUM.finditer(lowered):
            s, e = m.span()
            brks = [s] + [i for i in range(s + 1, e)
                          if _camel_break(i)] + [e]
            for a, b in zip(brks, brks[1:]):
                if min_len <= b - a <= max_len:
                    out.append((lowered[a:b], a, b))
        return out
    if analyzer == "english":
        stop = set(ENGLISH_STOPWORDS)
        for m in re.finditer(r"\S+", lowered):
            tok = m.group(0)
            if tok in stop:
                continue
            st = s_stem(tok)
            if min_len <= len(st) <= max_len:
                out.append((st, m.start(), m.end()))
        return out
    raise ValueError(f"token_spans_py handles code/english, "
                     f"not {analyzer}")


def analyze(spark, text: str, analyzer: str = "code",
            min_len: int = 1, max_len: int = 64):
    """ES _analyze endpoint analog: run a string through the engine's
    ACTUAL Catalyst analysis chain -> (position, token, start_offset,
    end_offset) DataFrame. Debugging surface: what you see here is
    exactly what the index build and the query tokenizer produce (same
    ``tokenize_expr``).

    Offsets are the ES char offsets of each token in the input. For
    analyzers whose tokens are verbatim substrings (``simple`` —
    offsets over the lowercased text, same char positions since
    lowercasing is 1:1 on ASCII — ``whitespace``, ``keyword``) they
    fold inside the Catalyst expression. The REWRITING chains
    (``code``: camelCase split; ``english``: stop + stem) thread the
    char map the way ES's token filters do — camel sub-segments carry
    their own spans, a stemmed token keeps its pre-stem span, dropped
    stopwords emit nothing — via :func:`token_spans_py` (token stream
    identical to the Catalyst chain, pinned by test). The one
    undefined case — a length-changing non-ASCII case-fold — reports
    null offsets rather than wrong ones.

    A token dropped by the ``min_len``/``max_len`` filter does not
    advance the offset cursor, so a later identical substring inside
    the dropped token's span can claim its offset — ES computes offsets
    before token filters and cannot drift this way. Positions (what the
    index actually stores) are unaffected."""
    df = spark.createDataFrame([(text,)], "text string")
    toks = tokenize_expr("text", analyzer, min_len, max_len)
    ref = {"simple": F.lower(F.col("text")),
           "whitespace": F.col("text"),
           "keyword": F.col("text")}.get(analyzer)
    if ref is None:
        spans = (token_spans_py(text, analyzer, min_len, max_len)
                 if analyzer in ("code", "english") else None)
        if spans is None:  # undefined char map: null offsets
            return df.select(
                F.posexplode(toks).alias("position", "token"),
                F.lit(None).cast("int").alias("start_offset"),
                F.lit(None).cast("int").alias("end_offset"))
        return spark.createDataFrame(
            [(i, t, s, e) for i, (t, s, e) in enumerate(spans)],
            "position int, token string, start_offset int, "
            "end_offset int")
    return df.select(F.inline(_offsets_fold(toks, ref)))
