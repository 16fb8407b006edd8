"""Deterministic synthetic source-code corpus (the ``input_hint`` table).

Shape: ``(repo:string, path:string, commit:string, lang:string,
content:string)``. Pure function of (seed, n): no wall clock, no
unseeded randomness — required for the resume/rank-identity tests
(SURVEY.md §5, FIXTURES.md §1).

Skew fixtures baked in (north rule: "skew from mega-repos and
stop-term-heavy postings"):
- ONE mega-repo holding ~30% of rows;
- per-lang keyword stop-terms appearing in nearly every doc of a lang;
- Zipf-distributed identifier vocabulary;
- camelCase + snake_case identifiers (tokenizer fixture).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["java", "python", "js", "go", "rust"]
# stop-term fixture: appear in ~every doc of the lang (hot postings)
LANG_KEYWORDS = {
    "java": ["public", "static", "void", "class", "return", "import"],
    "python": ["def", "self", "return", "import", "class", "none"],
    "js": ["function", "const", "return", "var", "let", "export"],
    "go": ["func", "package", "return", "err", "nil", "import"],
    "rust": ["fn", "let", "mut", "impl", "pub", "use"],
}
LANG_EXT = {"java": "java", "python": "py", "js": "js", "go": "go", "rust": "rs"}

_CAMEL_HEADS = ["get", "set", "build", "parse", "read", "write", "merge", "scan"]
_CAMEL_TAILS = ["Index", "Buffer", "Entity", "Shard", "Token", "Query", "Score", "Block"]
_SNAKE_PARTS = ["doc", "term", "posting", "block", "delta", "var", "byte", "hash",
                "seg", "merge", "freq", "len", "norm", "rank", "heap", "node"]


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def _zipf_vocab(vocab_size: int) -> np.ndarray:
    # identifiers id0000..idNNNN; probability ~ 1/rank (Zipf s=1)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


def generate_corpus_pdf(seed: int, n: int, vocab_size: int = 2000) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (driver-side for tests;
    at scale the same function runs inside mapInPandas over a range df —
    see :func:`generate_corpus_df`)."""
    return _generate_rows(seed, np.arange(n, dtype=np.int64), vocab_size)


def _generate_rows(seed: int, idx: np.ndarray, vocab_size: int) -> pd.DataFrame:
    p = _zipf_vocab(vocab_size)
    vocab = np.array([f"id{j:04d}" for j in range(vocab_size)])
    rows = []
    for i in idx.tolist():
        g = _rng(seed, i)
        # mega-repo skew: ~30% of rows in org0/megarepo
        if g.random() < 0.30:
            repo = "org0/megarepo"
        else:
            repo = f"org{i % 7}/repo{i % 101}"
        lang = LANGS[int(g.integers(0, len(LANGS)))]
        n_tokens = int(g.integers(10, 400))
        toks = list(g.choice(vocab, size=n_tokens, p=p))
        # per-lang stop terms: hot postings fixture
        kw = LANG_KEYWORDS[lang]
        for _ in range(max(1, n_tokens // 8)):
            toks.insert(int(g.integers(0, len(toks))), kw[int(g.integers(0, len(kw)))])
        # identifier-splitting fixtures
        toks.insert(0, _CAMEL_HEADS[i % len(_CAMEL_HEADS)]
                    + _CAMEL_TAILS[int(g.integers(0, len(_CAMEL_TAILS)))])
        toks.append("_".join(g.choice(_SNAKE_PARTS, size=2, replace=False).tolist()))
        content = " ".join(toks)
        path = f"src/m{i % 13}/{_SNAKE_PARTS[i % len(_SNAKE_PARTS)]}{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40]
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus_df(spark, seed: int, n: int, vocab_size: int = 2000,
                       n_partitions: int = 8):
    """Distributed generator: spark.range drives per-partition pandas
    generation — the corpus never materializes on the driver, so the
    same function scales to any n."""
    from pyspark.sql import functions as F  # noqa: F401

    base = spark.range(0, n, 1, n_partitions)

    def gen(batches):
        for pdf in batches:
            yield _generate_rows(seed, pdf["id"].to_numpy(), vocab_size)

    schema = "repo string, path string, commit string, lang string, content string"
    return base.mapInPandas(gen, schema=schema)


def with_content_sha(df):
    """Row invariant column (input_hint: content sha256 equality between
    source table and doc-store)."""
    from pyspark.sql import functions as F

    return df.withColumn("content_sha", F.sha2(F.col("content"), 256))
