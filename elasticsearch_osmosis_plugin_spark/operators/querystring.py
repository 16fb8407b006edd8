"""Lucene ``query_string`` syntax: parser + compiler onto native ops.

The reference stack's users query ES 0.90 through the URI search
``q=`` parameter and the ``query_string`` query, both of which speak
Lucene's classic QueryParser syntax (the reference's integration tests
drive search through the same Java client those endpoints route to).
This module gives that surface natively:

    +spark "query join" win* dup^2 -merge
    (spark OR window) AND NOT dup
    text:spark AND _exists_:lang

Grammar (the practical classic-parser subset)::

    query  := clause+
    clause := [+|-|NOT] [field:] atom [^boost]
    atom   := term | term~N | prefix* | wild?card* | "phrase" [~slop]
              | ( query )

Occur resolution follows the classic one-pass QueryParser rules:
``+``/``-``/``NOT`` pin a clause to MUST / MUST_NOT; ``a AND b``
upgrades both neighbors to MUST (unless pinned); ``a OR b`` marks
both SHOULD; bare clauses take ``default_operator`` (OR -> SHOULD,
AND -> MUST). A group with MUSTs requires all of them and lets
SHOULDs only add score (ES bool semantics); a group with only
SHOULDs requires at least one.

Scoring follows Lucene's rewrite rules where they are cheap and
documents the one divergence:

- term leaves score the real BM25 partial (boost-scaled), ALL term
  leaves in the tree sharing ONE postings decode;
- prefix / wildcard / fuzzy leaves rewrite to constant_score
  (1.0 * boost per matching doc) — exactly Lucene's default
  multi-term rewrite (``CONSTANT_SCORE_REWRITE``);
- phrase leaves contribute constant 1.0 * boost (divergence: Lucene
  scores phrases by phrase frequency; the contiguity CHECK here is
  exact via positional postings, only the matched clause's score
  contribution is flattened).

Field prefixes: the indexed text field (``meta["text_col"]``) and
bare atoms hit the index; ``_exists_:col`` filters on a doc-store
carry column; any other field raises (single-field index).

Scale: one bucket-pruned postings decode for every scored term, each
multi-term expansion is a metadata-only dictionary scan, clause
algebra is hash-aggregation on doc_id, and the final k-cut is a
TakeOrderedAndProject — no driver-side evaluation anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.functions.tokenizer import tokenize_py
from elasticsearch_osmosis_plugin_spark.operators.topk import deterministic_topk

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


@dataclass
class Leaf:
    kind: str                    # term | prefix | wildcard | fuzzy | phrase | exists
    text: str
    boost: float = 1.0
    fuzz: int = 0                # fuzzy max_edits
    slop: int = 0                # phrase slop
    field: str | None = None


@dataclass
class Group:
    children: list[tuple[str, object]] = dc_field(default_factory=list)


_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<lpar>\() | (?P<rpar>\)) |
      (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
      (?P<plus>\+) | (?P<minus>-) |
      (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?) |
      (?P<atom>[^\s()+\-!"^~][^\s()"^~]*)
        (?:~(?P<fuzz>\d*))? (?:\^(?P<boost>\d+(?:\.\d+)?))?
    )""", re.VERBOSE)


def _scan(q: str):
    """Yield (kind, payload) tokens; raises on unparseable input."""
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                return
            raise ValueError(f"query_string: cannot parse at: {q[pos:]!r}")
        pos = m.end()
        if m.group("lpar"):
            yield ("(", None)
        elif m.group("rpar"):
            yield (")", None)
        elif m.group("and"):
            yield ("AND", None)
        elif m.group("or"):
            yield ("OR", None)
        elif m.group("not"):
            yield ("NOT", None)
        elif m.group("plus"):
            yield ("+", None)
        elif m.group("minus"):
            yield ("-", None)
        elif m.group("phrase"):
            yield ("PHRASE", (m.group("ph"), int(m.group("slop") or 0)))
        else:
            yield ("ATOM", (m.group("atom"),
                            m.group("fuzz"), m.group("boost")))


def _leaf_from_atom(atom: str, fuzz: str | None, boost: str | None) -> Leaf:
    fld = None
    if ":" in atom:
        fld, atom = atom.split(":", 1)
    b = float(boost) if boost else 1.0
    if fld == "_exists_":
        return Leaf("exists", atom, b)
    if fuzz is not None:                       # trailing ~ or ~N
        return Leaf("fuzzy", atom, b, fuzz=int(fuzz) if fuzz else 2,
                    field=fld)
    if "*" in atom or "?" in atom:
        if atom.endswith("*") and not re.search(r"[*?]", atom[:-1]):
            return Leaf("prefix", atom[:-1], b, field=fld)
        return Leaf("wildcard", atom, b, field=fld)
    return Leaf("term", atom, b, field=fld)


def parse_query_string(q: str, default_operator: str = "OR") -> Group:
    """Parse to a Group tree with classic-QueryParser occur rules."""
    tokens = list(_scan(q))
    pos = 0

    def parse_group(depth: int) -> Group:
        nonlocal pos
        g = Group()
        default_occur = MUST if default_operator.upper() == "AND" else SHOULD
        pending: str | None = None      # +/-/NOT pin for the next clause
        conj: str | None = None         # AND/OR seen since last clause
        pinned: list[bool] = []         # per-child: occur was explicit
        while pos < len(tokens):
            kind, payload = tokens[pos]
            pos += 1
            if kind == ")":
                if depth == 0:
                    raise ValueError("query_string: unbalanced ')'")
                break
            if kind in ("AND", "OR"):
                conj = kind
                # AND retroactively requires the previous clause;
                # OR retroactively relaxes it (classic parser rule)
                if g.children and not pinned[-1]:
                    occ = MUST if kind == "AND" else SHOULD
                    g.children[-1] = (occ, g.children[-1][1])
                continue
            if kind == "NOT":
                pending = MUST_NOT
                continue
            if kind == "+":
                pending = MUST
                continue
            if kind == "-":
                pending = MUST_NOT
                continue
            if kind == "(":
                node: object = parse_group(depth + 1)
            elif kind == "PHRASE":
                text, slop = payload
                node = Leaf("phrase", text, 1.0, slop=slop)
            else:
                node = _leaf_from_atom(*payload)
            if pending is not None:
                occ, explicit = pending, True
            elif conj == "AND":
                occ, explicit = MUST, False
            elif conj == "OR":
                occ, explicit = SHOULD, False
            else:
                occ, explicit = default_occur, False
            g.children.append((occ, node))
            pinned.append(explicit)
            pending, conj = None, None
        else:
            if depth > 0:
                raise ValueError("query_string: unbalanced '('")
        if not g.children:
            raise ValueError("query_string: empty query")
        return g

    root = parse_group(0)
    if pos < len(tokens):
        raise ValueError("query_string: unbalanced ')'")
    return root


# ---------------------------------------------------------------- compile

def _collect_terms(node, meta, out: set[str]) -> None:
    if isinstance(node, Group):
        for _, c in node.children:
            _collect_terms(c, meta, out)
        return
    if node.kind == "term":
        out.update(_analyzed(node.text, meta))


def _analyzed(text: str, meta: dict) -> list[str]:
    """Order-preserving analysis (phrases need token ORDER; sorting
    through query.query_terms would silently flip the phrase)."""
    return tokenize_py(text, meta["analyzer"],
                       min_len=meta.get("min_token_len", 1),
                       max_len=meta.get("max_token_len", 64))


def query_string_topk(spark: SparkSession, index_path: str, q: str,
                      k: int = 10, default_operator: str = "OR",
                      max_expansions: int = 1000) -> DataFrame:
    """Rank the index with a Lucene query_string -> (doc_id, score)."""
    from elasticsearch_osmosis_plugin_spark.operators import intersect
    from elasticsearch_osmosis_plugin_spark.operators.query import (
        _scored,
        dictionary_rows,
        idf,
        load_meta,
        tombstones_df,
    )
    from elasticsearch_osmosis_plugin_spark.plans import catalog

    meta = load_meta(index_path)
    tree = parse_query_string(q, default_operator)

    all_terms: set[str] = set()
    _collect_terms(tree, meta, all_terms)
    dic = dictionary_rows(spark, index_path, sorted(all_terms), meta)
    idf_by_term = {r.term: idf(meta["n_docs"], int(r.df))
                   for r in dic.itertuples()}
    denied = tombstones_df(spark, index_path, meta)
    shared = (_scored(spark, index_path, sorted(idf_by_term), meta,
                      idf_by_term, denied=denied)
              if idf_by_term else None)

    empty = spark.createDataFrame([], "doc_id long, score double")

    def compile_leaf(leaf: Leaf) -> DataFrame:
        indexed = meta.get("text_col")  # absent on pre-r2 indexes
        if leaf.kind != "exists" and leaf.field is not None \
                and indexed is not None and leaf.field != indexed:
            raise ValueError(
                f"query_string: unknown field {leaf.field!r} "
                f"(index covers {indexed!r})")
        if leaf.kind == "term":
            terms = [t for t in dict.fromkeys(_analyzed(leaf.text, meta))
                     if t in idf_by_term]
            if not terms or shared is None:
                return empty
            return (shared.filter(F.col("term").isin(terms))
                    .groupBy("doc_id")
                    .agg((F.sum("partial") * F.lit(leaf.boost)).alias("score")))
        if leaf.kind == "exists":
            ds = catalog.read_table(spark, index_path, "docstats")
            return ds.filter(F.col(leaf.text).isNotNull()).select(
                "doc_id", F.lit(leaf.boost).alias("score"))
        if leaf.kind == "phrase":
            toks = _analyzed(leaf.text, meta)
            if not toks:
                return empty
            if len(toks) == 1:
                ids = intersect.match_all_terms(spark, index_path, toks[0])
            elif leaf.slop:
                ids = intersect.span_near(spark, index_path, " ".join(toks),
                                          slop=leaf.slop, in_order=True)
            else:
                ids = intersect.match_phrase(spark, index_path,
                                             " ".join(toks))
            return ids.select("doc_id", F.lit(leaf.boost).alias("score"))
        if leaf.kind == "prefix":
            ids = intersect.match_expanded(spark, index_path,
                                           leaf.text.lower(), mode="prefix",
                                           max_expansions=max_expansions)
        elif leaf.kind == "wildcard":
            pat = re.escape(leaf.text.lower()) \
                .replace(r"\*", ".*").replace(r"\?", ".")
            ids = intersect.match_expanded(spark, index_path, pat,
                                           mode="regex",
                                           max_expansions=max_expansions)
        elif leaf.kind == "fuzzy":
            ids = intersect.match_fuzzy(spark, index_path, leaf.text.lower(),
                                        max_edits=min(leaf.fuzz, 2),
                                        max_expansions=max_expansions)
        else:
            raise ValueError(f"query_string: unknown leaf {leaf.kind!r}")
        return ids.select("doc_id", F.lit(leaf.boost).alias("score"))

    def compile_node(node) -> DataFrame:
        if isinstance(node, Leaf):
            return compile_leaf(node)
        musts = [compile_node(c) for occ, c in node.children if occ == MUST]
        shoulds = [compile_node(c) for occ, c in node.children
                   if occ == SHOULD]
        nots = [compile_node(c) for occ, c in node.children
                if occ == MUST_NOT]
        base = None
        if musts:
            u = None
            for i, m in enumerate(musts):
                part = m.select("doc_id", "score",
                                F.lit(i).alias("_cid"))
                u = part if u is None else u.unionByName(part)
            base = (u.groupBy("doc_id")
                    .agg(F.sum("score").alias("score"),
                         F.countDistinct("_cid").alias("_n"))
                    .filter(F.col("_n") == len(musts))
                    .select("doc_id", "score"))
        if shoulds:
            su = None
            for s in shoulds:
                su = s if su is None else su.unionByName(s)
            su = su.groupBy("doc_id").agg(F.sum("score").alias("_s"))
            if base is None:
                base = su.select("doc_id", F.col("_s").alias("score"))
            else:
                # ES bool: SHOULDs beside MUSTs only add score
                base = (base.join(su, "doc_id", "left")
                        .select("doc_id",
                                (F.col("score")
                                 + F.coalesce(F.col("_s"), F.lit(0.0)))
                                .alias("score")))
        if base is None:
            raise ValueError(
                "query_string: purely negative query matches nothing")
        for n in nots:
            base = base.join(n.select("doc_id"), "doc_id", "left_anti")
        return base

    return deterministic_topk(compile_node(tree), k)
