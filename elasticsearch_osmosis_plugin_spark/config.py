"""Engine configuration.

Mirrors the reference's layered parameter resolution
(``Parameters.Builder``, reference ``Parameters.java:51-82``; layering
order ``ElasticSearchWriterFactory.java:46-73``): packaged defaults
<- optional user dict <- explicit kwargs, later layers win.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace
from typing import Any, Mapping


@dataclass(frozen=True)
class EngineConfig:
    """All knobs for index build + query.

    BM25 constants are fixed by the north rule (k1=1.2, b=0.75).
    ``n_segments``/``n_buckets`` are the scale knobs: segments are
    disjoint doc_id ranges (the SPIMI partition unit), buckets are the
    term-hash partitioning of the postings table (the analog of the
    reference's 5-shard index distribution,
    ``plugin.properties:8-9``).
    """

    # BM25
    k1: float = 1.2
    b: float = 0.75

    # index layout
    n_segments: int = 32          # doc hash-buckets (docstats seg + resume groups)
    n_buckets: int = 16           # term-hash partitions of postings table
    block_size: int = 128         # postings entries per block (block-max unit)
    segment_token_budget: int = 2_000_000  # SPIMI in-memory segment size
    store_positions: bool = True  # varbyte position deltas per (term, doc)
    #   -> phrase queries intersect positions index-side instead of
    #   needing the retained term-vector corpus (2x storage at scale)

    # tokenizer
    analyzer: str = "code"        # "code" (identifier-aware), "simple" (ws
                                  # split), or "english" (stop set + S-stem)
    min_token_len: int = 1
    max_token_len: int = 64
    lowercase: bool = True

    # execution
    shuffle_partitions: int = 32
    arrow_batch_size: int = 10_000

    # skew handling: none needed as a knob — hot-term aggregations are
    # pre-reduced per (seg, block) by the SPIMI build (map-side
    # combine covers the rest), hot join keys are pruned explicitly
    # (dedupe.max_shingle_df / max_band_bucket), and AQE skew-join is
    # on in session defaults

    # resumability
    resume: bool = True

    extras: Mapping[str, Any] = field(default_factory=dict)

    @staticmethod
    def resolve(user: Mapping[str, Any] | None = None, **kwargs: Any) -> "EngineConfig":
        """Layered resolution: defaults <- user mapping <- kwargs."""
        cfg = EngineConfig()
        known = {f.name for f in fields(EngineConfig)}
        merged: dict[str, Any] = {}
        extras: dict[str, Any] = {}
        for layer in (user or {}), kwargs:
            for k, v in layer.items():
                if k in known and k != "extras":
                    merged[k] = v
                else:
                    extras[k] = v
        if extras:
            merged["extras"] = {**cfg.extras, **extras}
        return replace(cfg, **merged)

    def doc_id_range_width(self) -> int:
        """Width of each segment's doc_id range over the 62-bit id space."""
        return (1 << 62) // self.n_segments
