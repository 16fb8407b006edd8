"""Derived-index builders (SURVEY A24) — the reference's extension
surface.

The reference instantiates user-named ``AbstractIndexBuilder``
subclasses by reflection (``ElasticSearchWriterFactory.java:106-125``)
and runs them sequentially after the main ingest, aborting the chain
on the first failure (``ElasticSearchWriterTask.java:58-74``;
contract ``AbstractIndexBuilder.java:20-26,71-80``). Spark-native: a
registry of Python callables ``(spark, index_path, cfg) -> None``,
each writing its own derived table through the atomic catalog; dotted
import paths give the same load-by-name behavior as reflection.

Built-in example builders (the ``HighwayIndexBuilder`` analogs):
- ``lang_stats``: per-language doc counts + length stats from docstats;
- ``hot_terms``: the df-heaviest terms from the dictionary — the
  stop-term list an operator would feed back into the analyzer.
"""

from __future__ import annotations

import importlib
import time
from typing import Callable, Sequence

from pyspark.sql import SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.config import EngineConfig
from elasticsearch_osmosis_plugin_spark.plans import catalog

Builder = Callable[[SparkSession, str, EngineConfig], None]

_REGISTRY: dict[str, Builder] = {}


def register(name: str):
    def deco(fn: Builder) -> Builder:
        _REGISTRY[name] = fn
        return fn
    return deco


def resolve(name: str) -> Builder:
    """Registry lookup, else dotted-path import (reflection analog,
    ``ElasticSearchWriterFactory.java:116-120``)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if "." in name:
        mod, attr = name.rsplit(".", 1)
        return getattr(importlib.import_module(mod), attr)
    raise KeyError(f"unknown derived-index builder: {name}")


class DerivedIndexError(RuntimeError):
    pass


def run_derived_builders(spark: SparkSession, index_path: str,
                         names: Sequence[str],
                         cfg: EngineConfig = EngineConfig()) -> list[dict]:
    """Sequential, abort-on-first-failure (reference semantics:
    'Index creation chain aborted on first failure',
    ``ElasticSearchWriterTask.java:66-72``). Returns per-builder
    lineage records for the ones that ran."""
    lineage: list[dict] = []
    for name in names:
        t0 = time.time()
        try:
            resolve(name)(spark, index_path, cfg)
        except Exception as e:
            raise DerivedIndexError(
                f"derived-index chain aborted at {name!r}: {e}") from e
        lineage.append({"builder": name, "wall_s": time.time() - t0})
    return lineage


@register("lang_stats")
def build_lang_stats(spark: SparkSession, index_path: str,
                     cfg: EngineConfig) -> None:
    ds = catalog.read_table(spark, index_path, "docstats")
    if "lang" not in ds.columns:
        raise ValueError("docstats carries no lang column")
    out = ds.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
        F.max("dl").alias("max_dl"))
    catalog.create_or_replace(out, index_path, "derived/lang_stats",
                              manifest={"stage": "derived:lang_stats"})


@register("hot_terms")
def build_hot_terms(spark: SparkSession, index_path: str,
                    cfg: EngineConfig, top_n: int = 100) -> None:
    dic = catalog.read_table(spark, index_path, "dictionary")
    out = dic.orderBy(F.desc("df"), F.asc("term")).limit(top_n) \
             .select("term", "df", "cf")
    catalog.create_or_replace(out, index_path, "derived/hot_terms",
                              manifest={"stage": "derived:hot_terms"})
