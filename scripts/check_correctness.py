#!/usr/bin/env python
"""Local stand-in for the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified).  Exit code 1 on any mismatch.

Non-scalar output columns (ArrayType/MapType/StructType) are a hard FAIL
even when values match: the driver's pandas canonicalizer factorizes every
column and dies on complex cells (``TypeError: unhashable type: 'list'``)
— in r4 this script happily stringified a list column and printed 92/92 OK
while the driver failed ta_doc_vectors, the exact local-PASS/driver-FAIL
divergence it exists to prevent (r4 verdict item 2).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark(app_name="check-correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from pyspark.sql.types import ArrayType, MapType, StructType

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            print(
                f"  {name:28s} NON-SCALAR output columns {complex_cols} — "
                "the driver's pandas canonicalizer cannot factorize complex "
                "cells  FAIL"
            )
            failures.append(name)
            continue
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"  {name:28s} rows={len(s_rows):7d}  (no oracle — rows-only)  {time.time()-t0:5.1f}s")
            continue
        cur = con.execute(oracles[name])
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
        ok_n = len(s_rows) == len(d_rows)
        ok_c = sorted(s_cols) == sorted(d_cols)
        ok_h = ok_c and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
        status = "OK" if (ok_n and ok_c and ok_h) else "FAIL"
        print(
            f"  {name:28s} rows={len(s_rows):7d}/{len(d_rows):7d} cols={'=' if ok_c else '!'} "
            f"hash={'=' if ok_h else '!'} {status}  {time.time()-t0:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_c:
                print(f"    spark cols: {s_cols}\n    duck  cols: {d_cols}")
            elif not ok_h and s_rows and d_rows:
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ss = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                dd = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                diff = [(a, b) for a, b in zip(ss, dd) if a != b][:3]
                for a, b in diff:
                    print(f"    spark: {a}\n    duck : {b}")
                only_s = set(ss) - set(dd)
                only_d = set(dd) - set(ss)
                for x in list(only_s)[:2]:
                    print(f"    only-spark: {x}")
                for x in list(only_d)[:2]:
                    print(f"    only-duck : {x}")
    print(f"{len(qs) - len(failures)}/{len(qs)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
