"""Driver-local serving path for interactive top-k queries.

Elasticsearch serves searches from open segment readers on the data
node — it never launches a cluster job per query. The analogous split
here: Spark relations remain the BULK path (index builds, analytics,
batched multi-query scoring), while this module answers a single
interactive query by reading the SAME index layout — dictionary and
posting buckets, hive-partitioned parquet — directly through pyarrow
on the driver, decoding with the same numpy varbyte kernels, and
scoring with the same BM25 arithmetic. No Spark job, no scheduler
round-trip: the ~0.4 s fixed per-job latency of the distributed path
drops to single-digit milliseconds for dictionary-pruned reads.

Rank identity with the distributed scoreall path is pinned by tests
(build → append → delete → compact lifecycle); the local path refuses
(ValueError) anything it cannot answer bit-for-bit (post_filter,
boosts, minimum_should_match route to the Spark path).

Scale note: this is a SERVING optimization, not a bypass of the
execution model — the read is bounded by the query terms' dictionary
buckets (row-group pruned by the term-sorted layout), exactly the
data a distributed task would read, just without a cluster in the
loop. On a real deployment the index lives on shared storage
(S3/HDFS); pyarrow reads it the same way.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from elasticsearch_osmosis_plugin_spark.functions.varbyte import vb_decode
from elasticsearch_osmosis_plugin_spark.plans.build import (
    bucket_of,
    index_groups,
    load_meta,
)


def _posting_dirs(index_path: str, meta: dict) -> list[str]:
    """Live posting table dirs — mirrors plans.build.postings_df's
    merged + fresh-groups read path (compact → append → query must see
    appended docs)."""
    import json

    base = os.path.join(index_path, "postings")
    groups = index_groups(meta)
    merged_dir = os.path.join(index_path, "postings_merged")
    if meta.get("merged") and os.path.exists(
            os.path.join(merged_dir, "_MANIFEST.json")):
        covered = meta.get("merged_groups")
        if covered is None:
            with open(os.path.join(merged_dir, "_MANIFEST.json")) as f:
                n = int(json.load(f).get("merged_groups", len(groups)))
            covered = groups[:n]
        extra = [g for g in groups if g not in set(covered)]
        return [merged_dir] + [os.path.join(base, f"group={g}")
                               for g in extra]
    return [os.path.join(base, f"group={g}") for g in groups]


def _bucket_files(dirs: list[str], bucket: int) -> list[str]:
    out = []
    for d in dirs:
        out.extend(sorted(glob.glob(
            os.path.join(d, f"bucket={bucket}", "*.parquet"))))
    return out


def _read_filtered(files: list[str], columns: list[str],
                   terms: list[str]):
    """Read parquet files with a term-IN filter; the posting layout is
    sortWithinPartitions(term, ...) so row-group statistics prune
    whole runs before any page decodes."""
    import pyarrow.dataset as pds

    if not files:
        return None
    dset = pds.dataset(files, format="parquet")
    return dset.to_table(columns=columns,
                         filter=pds.field("term").isin(terms))


def local_dictionary_rows(index_path: str, meta: dict,
                          terms: list[str]) -> dict[str, dict]:
    """term -> {df, cf, max_wand} via a driver-local pruned read of
    the dictionary buckets (metadata-tiny)."""
    dic_dir = os.path.join(index_path, "dictionary")
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(bucket_of(t, meta["n_buckets"]), []).append(t)
    out: dict[str, dict] = {}
    for b, ts in sorted(by_bucket.items()):
        files = sorted(glob.glob(
            os.path.join(dic_dir, f"bucket={b}", "*.parquet")))
        tbl = _read_filtered(files, ["term", "df", "cf", "max_wand"], ts)
        if tbl is None:
            continue
        for row in tbl.to_pylist():
            out[row["term"]] = row
    return out


def _tombstone_ids(index_path: str, meta: dict) -> np.ndarray | None:
    if not meta.get("tombstones_n"):
        return None
    import pyarrow.dataset as pds

    files = sorted(glob.glob(
        os.path.join(index_path, "tombstones", "*.parquet")))
    if not files:
        return None
    arr = (pds.dataset(files, format="parquet")
           .to_table(columns=["doc_id"])["doc_id"].to_numpy())
    return np.sort(arr.astype(np.int64))


def local_topk(index_path: str, query_terms: list[str], k: int = 10,
               meta: dict | None = None,
               dic_rows: dict[str, dict] | None = None
               ) -> list[tuple[int, float]]:
    """Driver-local BM25 top-k: returns [(doc_id, score)] in the same
    deterministic (score desc, doc_id asc) order as the distributed
    scoreall path. ``dic_rows``: optional pre-fetched dictionary rows
    (a Searcher's local memo)."""
    meta = meta if meta is not None else load_meta(index_path)
    if dic_rows is None:
        dic_rows = local_dictionary_rows(index_path, meta, query_terms)
    live = [t for t in query_terms if t in dic_rows]
    if not live:
        return []
    from elasticsearch_osmosis_plugin_spark.operators.query import idf

    k1, b, avgdl = meta["k1"], meta["b"], float(meta["avgdl"])
    n_docs = int(meta["n_docs"])
    dirs = _posting_dirs(index_path, meta)
    by_bucket: dict[int, list[str]] = {}
    for t in live:
        by_bucket.setdefault(bucket_of(t, meta["n_buckets"]), []).append(t)
    ids_parts, w_parts = [], []
    for bkt, ts in sorted(by_bucket.items()):
        tbl = _read_filtered(
            _bucket_files(dirs, bkt),
            ["term", "doc_ids_vb", "tfs_vb", "dls_vb"], ts)
        if tbl is None or tbl.num_rows == 0:
            continue
        terms_col = tbl["term"].to_pylist()
        ids_col = tbl["doc_ids_vb"].to_pylist()
        tfs_col = tbl["tfs_vb"].to_pylist()
        dls_col = tbl["dls_vb"].to_pylist()
        for term, ids_vb, tfs_vb, dls_vb in zip(
                terms_col, ids_col, tfs_col, dls_col):
            d = np.cumsum(vb_decode(ids_vb),
                          dtype=np.uint64).astype(np.int64)
            tf = vb_decode(tfs_vb).astype(np.float64)
            dl = vb_decode(dls_vb).astype(np.float64)
            # identical arithmetic to query._decode_score
            w = idf(n_docs, int(dic_rows[term]["df"])) * tf * (k1 + 1.0) \
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids_parts.append(d)
            w_parts.append(w)
    if not ids_parts:
        return []
    all_ids = np.concatenate(ids_parts)
    all_w = np.concatenate(w_parts)
    uids, inv = np.unique(all_ids, return_inverse=True)
    scores = np.zeros(uids.size, dtype=np.float64)
    np.add.at(scores, inv, all_w)
    dead = _tombstone_ids(index_path, meta)
    if dead is not None and dead.size:
        pos = np.searchsorted(dead, uids)
        hit = (pos < dead.size) & (dead[np.minimum(pos, dead.size - 1)]
                                   == uids)
        uids, scores = uids[~hit], scores[~hit]
    order = np.lexsort((uids, -scores))[:k]
    return [(int(uids[i]), float(scores[i])) for i in order]
