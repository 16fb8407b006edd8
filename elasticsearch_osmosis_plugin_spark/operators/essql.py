"""ES SQL API (`POST /_sql`) analog: ES's SQL dialect executed on
Spark SQL.

Elasticsearch ships a SQL endpoint alongside the DSL and ES|QL; its
dialect is ANSI-ish SQL plus full-text extensions. The reference's
users reach it through the same server the plugin feeds
(``ESNodeITest.java`` round-trips through that node). Here the
dialect is compiled onto ``spark.sql`` — Catalyst is the engine — with
the ES-specific constructs rewritten first:

- ``MATCH(field, 'query')`` — full-text predicate. Rewritten against
  the engine's BM25 scorer: the driving table is augmented with a
  left-joined ``__score`` column and the predicate becomes
  ``__score IS NOT NULL`` (ES match = docs containing >= 1 analyzed
  term, scored).
- ``SCORE()`` — the BM25 relevance of the row, valid in SELECT /
  ORDER BY exactly like ES; rewritten to the joined score column.
  Rank-identical to the ``_search`` DSL and ES|QL paths (one scorer
  behind all three APIs).
- ``QUERY('lucene text')`` — query_string predicate: rewritten like
  MATCH using the default field's scorer over the Lucene-syntax
  parse (delegates term extraction to ``operators.querystring``).
- double-quoted identifiers (ES SQL) -> backquoted (Spark SQL),
  leaving single-quoted string literals untouched.
- ``SHOW TABLES`` / ``SHOW COLUMNS IN t`` / ``DESCRIBE t`` — answered
  from the bound table dict (ES answers from the index catalog).

Paging: ES SQL returns ``fetch_size`` rows + a cursor.
:class:`EsSqlCursor` wraps ``toLocalIterator`` — rows stream from the
executors page by page without materializing the result on the
driver, the same incremental contract as ES's cursor.

Constraints (documented, enforced): at most one distinct
MATCH/QUERY predicate per statement (ES allows several; one keeps
the score column well-defined — combine terms in one MATCH instead),
and the statement must name the searched table plainly (no
sub-select renaming of the scored table).

Scale notes: everything after the rewrite is a plain Catalyst plan —
pushdown/pruning/join strategy as if the user wrote spark.sql
directly. The score join is the BM25 engine's plan (broadcast term
stats, one corpus scan). Cursor paging never collects the full
result.
"""
from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, Row, SparkSession

from ..config import EngineConfig
from ..functions.tokenizer import tokenize_py


class EsSqlError(ValueError):
    pass


# --------------------------------------------------------------- rewriting

def _split_strings(sql: str) -> list[tuple[str, bool]]:
    """[(chunk, is_string_literal)] — split on single-quoted literals
    ('' escapes a quote, per SQL)."""
    out, i, n = [], 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c == "'":
            out.append(("".join(buf), False))
            buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append((sql[i:j + 1], True))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    out.append(("".join(buf), False))
    return out


def _dquote_to_backtick(sql: str) -> str:
    """ES SQL double-quoted identifiers -> Spark backticks (string
    literals untouched)."""
    return "".join(
        chunk if is_str else chunk.replace('"', "`")
        for chunk, is_str in _split_strings(sql))


# field may be bare or backticked — double-quoted identifiers are
# rewritten to backticks BEFORE this scan runs
_MATCH_RE = re.compile(
    r"\b(MATCH|QUERY)\s*\(\s*(?:`?([A-Za-z_][\w.]*)`?\s*,\s*)?"
    r"'((?:[^']|'')*)'\s*\)", re.IGNORECASE)
_SCORE_RE = re.compile(r"\bSCORE\s*\(\s*\)", re.IGNORECASE)


def _find_fulltext(sql: str) -> list[tuple[str, str | None, str]]:
    """All (kind, field, query) fulltext calls. The query text lives
    inside the call's own single quotes, so the scan runs over the raw
    sql (the regex requires the full ``MATCH(field, '..')`` shape, so
    a 'MATCH(' inside an unrelated string literal cannot produce a
    well-formed false hit that also parses as a call)."""
    return [(m.group(1).upper(), m.group(2),
             m.group(3).replace("''", "'"))
            for m in _MATCH_RE.finditer(sql)]


def _lucene_match_col(tree, tokens_col, analyzer: str):
    """Boolean Column for a Lucene tree over an analyzed-tokens array
    column: term/phrase leaves = all their analyzed tokens present
    (phrase adjacency relaxed — the SQL surface's documented
    simplification), prefix = any token with the prefix; MUST=AND,
    SHOULD=OR (>=1 when only SHOULDs), MUST_NOT negates."""
    from pyspark.sql import functions as F

    from .querystring import Group, Leaf

    def leaf_col(node):
        if node.kind in ("term", "phrase"):
            toks = tokenize_py(node.text, analyzer)
            if not toks:
                return F.lit(False)
            c = None
            for t in toks:
                e = F.array_contains(tokens_col, t)
                c = e if c is None else (c & e)
            return c
        if node.kind == "prefix":
            pref = node.text.lower()
            return F.exists(tokens_col, lambda t: t.startswith(pref))
        raise EsSqlError(f"ES SQL QUERY(): {node.kind} leaves not "
                         "supported — use the DSL/ES|QL surface")

    def walk(node):
        if isinstance(node, Leaf):
            return leaf_col(node)
        musts, shoulds, nots = [], [], []
        for occur, child in node.children:
            col = walk(child)
            (musts if occur == "MUST" else
             nots if occur == "MUST_NOT" else shoulds).append(col)
        out = None
        for c in musts:
            out = c if out is None else (out & c)
        if shoulds and out is None:       # only SHOULDs: >=1 required
            for c in shoulds:
                out = c if out is None else (out | c)
        for c in nots:
            out = ~c if out is None else (out & ~c)
        return out if out is not None else F.lit(True)

    return walk(tree)


def _lucene_terms(q: str, analyzer: str) -> set[str]:
    """Positive scoring terms of a Lucene query string (QUERY('..')
    SQL predicate): term/phrase leaves analyzed (BM25-scored); prefix
    leaves excluded here — Lucene rewrites them constant-score and
    each matched positive prefix leaf adds 1.0 via
    :func:`_prefix_bonus_col`; wildcard/fuzzy/exists leaves rejected
    — the SQL QUERY() contract here covers the scoring subset only."""
    from .querystring import Group, Leaf, parse_query_string

    out: set[str] = set()

    def walk(node) -> None:
        if isinstance(node, Leaf):
            if node.kind in ("term", "phrase"):
                out.update(tokenize_py(node.text, analyzer))
            elif node.kind != "prefix":
                raise EsSqlError(
                    f"ES SQL QUERY(): {node.kind} leaves not supported "
                    "— use the DSL/ES|QL surface for them")
            return
        for occur, child in node.children:
            if occur == "MUST_NOT":
                continue                    # excluded docs never score
            walk(child)

    walk(parse_query_string(q))
    return out


def _prefix_bonus_col(tree, tokens_col):
    """Constant-score contribution of the positive prefix leaves:
    Lucene rewrites each multi-term (prefix) clause to constant score
    1.0, and BooleanQuery SUMS matching clauses — so a doc's bonus is
    the COUNT of positive prefix leaves it matches (same per-leaf
    predicate as _lucene_match_col). None when the query has no
    positive prefix leaf."""
    from pyspark.sql import functions as F

    from .querystring import Leaf

    cols = []

    def walk(node, negated: bool) -> None:
        if isinstance(node, Leaf):
            if node.kind == "prefix" and not negated:
                pref = node.text.lower()
                cols.append(
                    F.exists(tokens_col, lambda t: t.startswith(pref))
                    .cast("double"))
            return
        for occur, child in node.children:
            walk(child, negated or occur == "MUST_NOT")

    walk(tree, False)
    if not cols:
        return None
    bonus = cols[0]
    for c in cols[1:]:
        bonus = bonus + c
    return bonus


# ------------------------------------------------------------------ engine

class EsSql:
    """Bind tables once, run ES-SQL statements against them."""

    def __init__(self, spark: SparkSession,
                 tables: dict[str, DataFrame], *,
                 analyzer: str = "simple", id_col: str = "doc_id",
                 default_field: str = "text",
                 cfg: EngineConfig | None = None):
        self.spark, self.tables = spark, dict(tables)
        self.analyzer, self.id_col = analyzer, id_col
        self.default_field = default_field
        self.cfg = cfg or EngineConfig()

    # -- metadata statements
    def _show(self, sql: str) -> DataFrame | None:
        s = sql.strip().rstrip(";").strip()
        if re.fullmatch(r"SHOW\s+TABLES", s, re.IGNORECASE):
            rows = [Row(name=t, type="TABLE")
                    for t in sorted(self.tables)]
            return self.spark.createDataFrame(rows)
        m = re.fullmatch(r"(?:SHOW\s+COLUMNS\s+(?:IN|FROM)|DESCRIBE|DESC)"
                         r"\s+[`\"]?([\w.]+)[`\"]?", s, re.IGNORECASE)
        if m:
            t = m.group(1)
            if t not in self.tables:
                raise EsSqlError(f"ES SQL: unknown table {t!r}")
            rows = [Row(column=f.name, type=f.dataType.simpleString())
                    for f in self.tables[t].schema.fields]
            return self.spark.createDataFrame(rows)
        return None

    def _score_frame(self, table: str, field: str | None, query: str,
                     kind: str) -> DataFrame:
        from .bm25 import bm25_score_terms

        if table not in self.tables:
            raise EsSqlError(f"ES SQL: unknown table {table!r}")
        df = self.tables[table]
        field = field or self.default_field
        if kind == "QUERY":
            from .querystring import parse_query_string

            tree = parse_query_string(query)
            terms = sorted(_lucene_terms(query, self.analyzer))
        else:
            tree = None
            terms = sorted(set(tokenize_py(query, self.analyzer)))
        if not terms and tree is None:
            raise EsSqlError("ES SQL: MATCH/QUERY with no analyzable terms")
        if terms:
            sc = bm25_score_terms(df, terms, self.cfg, id_col=self.id_col,
                                  text_col=field, analyzer=self.analyzer)
            sc = (sc.withColumnRenamed("doc_id", self.id_col)
                    .withColumnRenamed("score", "__score"))
            out = df.join(sc, self.id_col, "left")
        else:
            # no analyzable term leaves (pure-prefix query): the
            # constant-score bonus below is the whole score
            from pyspark.sql import functions as F

            out = df.withColumn("__score", F.lit(None).cast("double"))
        if tree is not None:
            from pyspark.sql import functions as F

            from ..functions.tokenizer import tokenize_expr

            toks = tokenize_expr(field, self.analyzer)
            out = out.withColumn("__match", F.coalesce(
                _lucene_match_col(tree, toks, self.analyzer),
                F.lit(False)))
            bonus = _prefix_bonus_col(tree, toks)
            if bonus is not None:
                # Lucene clause-sum: BM25 over the term leaves + 1.0
                # per matched positive prefix leaf. __score stays NULL
                # (no scoring clause matched) exactly when neither
                # side contributes, preserving the match invariant.
                hit = F.col("__score").isNotNull() | (bonus > 0)
                out = out.withColumn(
                    "__score",
                    F.when(hit, F.coalesce(F.col("__score"), F.lit(0.0))
                           + bonus))
        return out

    def df(self, sql: str) -> DataFrame:
        """Compile one ES-SQL statement to a DataFrame."""
        meta = self._show(sql)
        if meta is not None:
            return meta
        sql = _dquote_to_backtick(sql).rstrip().rstrip(";")
        full = _find_fulltext(sql)
        distinct = {(k, f, q) for k, f, q in full}
        has_score = bool(_SCORE_RE.search(sql))
        scored_table = None
        if len(distinct) > 1:
            raise EsSqlError(
                "ES SQL: at most one distinct MATCH/QUERY per statement "
                "— combine terms into one MATCH")
        if distinct:
            kind, field, query = next(iter(distinct))
            # the searched table = the single FROM table
            m = re.search(r"\bFROM\s+[`\"]?([\w.]+)[`\"]?", sql,
                          re.IGNORECASE)
            if not m:
                raise EsSqlError("ES SQL: MATCH requires a plain FROM")
            scored_table = m.group(1)
            frame = self._score_frame(scored_table, field, query, kind)
            pred = ("`__match`" if kind == "QUERY"
                    else "(`__score` IS NOT NULL)")
            sql = _MATCH_RE.sub(pred, sql)
            sql = _SCORE_RE.sub("COALESCE(`__score`, 0.0)", sql)
        elif has_score:
            raise EsSqlError("ES SQL: SCORE() needs a MATCH/QUERY "
                             "predicate in the statement")
        for name, df in self.tables.items():
            if name == scored_table:
                frame.createOrReplaceTempView(name)
            else:
                df.createOrReplaceTempView(name)
        try:
            return self.spark.sql(sql)
        finally:
            # leave no view bindings behind (tables dict stays the API)
            for name in self.tables:
                self.spark.catalog.dropTempView(name)

    def query(self, sql: str, fetch_size: int = 1000) -> "EsSqlCursor":
        """ES `/_sql` shape: first page + cursor for the rest."""
        return EsSqlCursor(self.df(sql), fetch_size)


class EsSqlCursor:
    """Streaming pages via toLocalIterator — never collects the full
    result on the driver (ES cursor contract)."""

    def __init__(self, df: DataFrame, fetch_size: int):
        if fetch_size < 1:
            raise EsSqlError("ES SQL: fetch_size must be >= 1")
        self.columns = df.columns
        self._it: Iterator[Row] = df.toLocalIterator()
        self.fetch_size = fetch_size
        self.closed = False

    def fetch(self) -> list[Row]:
        if self.closed:
            return []
        page = []
        for row in self._it:
            page.append(row)
            if len(page) >= self.fetch_size:
                return page
        self.closed = True        # exhausted -> ES omits the cursor
        return page

    def __iter__(self):
        while True:
            page = self.fetch()
            if not page:
                return
            yield page
