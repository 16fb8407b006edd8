"""Log-structured merge of per-group posting segments (SURVEY M3).

The build commits postings in ``n_groups`` checkpoint groups (the LSM
"levels" produced by resumable ingestion). Compaction merges them into
ONE term-sharded layout:

- one file per bucket (vs one per bucket per group),
- rows clustered by (term, seg, block) so a query term's blocks are
  contiguous in one row-group run,
- atomic swap via the catalog (drop-first semantics, A18), queries
  see old or new, never both.

Posting payloads are immutable (disjoint doc sets per (term, seg)) so
the merge is a pure re-layout — no decode/re-encode needed; that's the
benefit of segment-local posting construction. meta.json flips
``merged: true`` and records merge lineage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession, functions as F

from elasticsearch_osmosis_plugin_spark.plans import catalog
from elasticsearch_osmosis_plugin_spark.plans.build import index_groups, load_meta


def compact_index(spark: SparkSession, index_path: str) -> dict:
    """Merge all postings groups into postings_merged; update meta."""
    meta = load_meta(index_path)
    t0 = time.time()
    base = os.path.join(index_path, "postings")
    groups = [os.path.join(base, f"group={g}") for g in index_groups(meta)]
    posts = spark.read.option("basePath", base).parquet(*groups).drop("group")
    merged = (posts.repartition(meta["n_buckets"], "bucket")
              .sortWithinPartitions("term", "seg", "block"))
    n_rows = merged.count()
    catalog.create_or_replace(
        merged, index_path, "postings_merged",
        manifest={"stage": "merge", "n_rows": n_rows,
                  "merged_groups": len(index_groups(meta)),
                  "wall_s": time.time() - t0},
        partition_by=["bucket"])
    meta["merged"] = True
    meta["metrics"].append({"stage": "merge", "wall_s": time.time() - t0,
                            "n_rows": n_rows})
    tmp = os.path.join(index_path, "_meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, default=str)
    os.replace(tmp, os.path.join(index_path, "meta.json"))
    return meta


def drop_term_vectors(spark: SparkSession, index_path: str) -> None:
    """Space reclaim: rewrite docstats without the analyzed ``tokens``
    column once no further (resumed) builds or derived stages need it.
    A later ``build_index(resume=True)`` re-tokenizes from source."""
    man = catalog.read_manifest(index_path, "docstats")
    ds = catalog.read_table(spark, index_path, "docstats").drop("tokens")
    man.pop("schema", None)
    man["term_vectors"] = False
    catalog.create_or_replace(ds, index_path, "docstats", manifest=man,
                              partition_by=["grp"])


def drop_unmerged_groups(index_path: str) -> None:
    """Space reclaim after a successful compaction (optional)."""
    meta = load_meta(index_path)
    if not meta.get("merged"):
        raise RuntimeError("compact_index has not completed for this index")
    for g in index_groups(meta):
        catalog.drop_table(index_path, f"postings/group={g}")
