"""Standalone oracle-parity harness — replicates the driver's
correctness gate: run every ``__spark_entry__.queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet
tables; compare row count, column names, and values (column-name-
sorted, row-sorted, exact equality; floats must match bit-for-bit
because both sides round explicitly).

Usage: python tests/oracle_parity.py [sf_dir] [query ...]
       [--report PATH]   # also write the per-row pass/fail lines to
                         # PATH (committed per round as PARITY_rNN.txt
                         # so never-driver-sampled gate rows carry
                         # visible evidence)
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.sql(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def _norm_cell(v):
    # Type-faithful normalization (round 5): the driver's value hash is
    # type/format-sensitive, so this twin must be too. Python's cross-type
    # ``==`` (Decimal('75.0') == 75.0, 0.0 == -0.0, True == 1) previously
    # masked a DECIMAL-vs-DOUBLE oracle bug (esql_round_to, round 4) —
    # tag each numeric family distinctly instead of relying on ``==``.
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float-nan", 0.0)
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return ("float-negzero", 0.0)
        return ("float", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, int):
        return ("int", v)
    if v is None:
        return ("none", "")
    if hasattr(v, "isoformat"):
        return ("dt", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_norm_cell(x) for x in v))
    return ("other", repr(v))


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, out


def compare_one(spark, sf_dir: str, name: str, qfn, sql: str):
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = duck_run(sf_dir, sql)
    sc, sr = normalize(s_cols, s_rows)
    dc, dr = normalize(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"schema: spark={sc} duck={dc}")
    if len(sr) != len(dr):
        problems.append(f"rowcount: spark={len(sr)} duck={len(dr)}")
    if not problems and sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        extra_s = [r for r in sr if r not in set(dr)][:3]
        extra_d = [r for r in dr if r not in set(sr)][:3]
        problems.append(f"values differ; first diffs={diffs} "
                        f"spark-only={extra_s} duck-only={extra_d}")
    return problems, len(sr)


def main():
    args = sys.argv[1:]
    report_path = None
    if "--report" in args:
        i = args.index("--report")
        report_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from elasticsearch_osmosis_plugin_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    lines = []

    def emit(line):
        print(line)
        lines.append(line)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            emit(f"  {name:28s} rows-only: {n} rows")
            continue
        try:
            problems, n = compare_one(spark, sf_dir, name, fn, oracles[name])
        except Exception as e:  # noqa: BLE001
            problems, n = [f"exception: {type(e).__name__}: {e}"], -1
        if problems:
            failures += 1
            emit(f"✗ {name:28s} {problems}")
        else:
            emit(f"✓ {name:28s} {n} rows match")
    emit(f"\n{'FAIL' if failures else 'OK'}: {failures} mismatching queries")
    if report_path:
        with open(report_path, "w") as f:
            f.write(f"# oracle parity at {sf_dir}: "
                    f"{len(lines) - 1} rows checked\n")
            f.write("\n".join(lines) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
