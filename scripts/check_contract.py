"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compare row count, schema (column names), and an
order-insensitive value multiset.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from search_engine_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v + 0.0:.6f}"  # -0.0 and 0.0 are the same value
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # sf-dependent oracles (lsh_ann_topk) must be generated for this dir
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    only = set(sys.argv[2:])
    spark = get_spark(master="local[4]", shuffle_partitions=8, app_name="contract")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {str(e)[:300]}")
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        ms_s = row_multiset(srows, scols)
        ms_d = row_multiset(drows, dcols)
        ok_rows = len(srows) == len(drows)
        ok_vals = ms_s == ms_d
        if ok_schema and ok_rows and ok_vals:
            print(f"[OK]   {name}: {len(srows)} rows")
        else:
            failures.append((name, "mismatch"))
            print(
                f"[FAIL] {name}: schema={ok_schema} ({sorted(scols)} vs {sorted(dcols)}) "
                f"rows={len(srows)}/{len(drows)} vals={ok_vals}"
            )
            if not ok_vals:
                sset, dset = set(ms_s), set(ms_d)
                for x in list(sset - dset)[:3]:
                    print(f"   spark-only: {x[:200]}")
                for x in list(dset - sset)[:3]:
                    print(f"   duck-only:  {x[:200]}")
    spark.stop()
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES: ' + ', '.join(n for n, _ in failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
