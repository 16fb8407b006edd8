"""Deterministic top-k.

Reference analog: ranked hit lists with asserted order
(``ESNodeITest.java:187-193``) and order-sensitive reads
(``EntityDaoITest.java:266-280``). Rank determinism across partition
counts requires an explicit tie-break (SURVEY.md §7 watch-list (a)):
score DESC, doc_id ASC. ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject — per-partition heaps + driver merge, no global
sort, scale-safe for small k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deterministic_topk(df: DataFrame, k: int, score_col: str = "score",
                       id_col: str = "doc_id", round_dp: int | None = None) -> DataFrame:
    score = F.col(score_col)
    if round_dp is not None:
        score = F.round(score, round_dp)
        df = df.withColumn(score_col, score)
    return df.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(k)
