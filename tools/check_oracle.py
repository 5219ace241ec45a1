"""Driver-mimic harness: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB at the same sf, compare row count, column names,
and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from migration_pair_spark.session import get_spark

    spark = get_spark("check-oracle", master="local[8]")
    con = duckdb.connect()
    for tb in TABLES:
        p = f"{sf_dir}/{tb}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL  {name}: column mismatch {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diffs[:1]}"))
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            continue
        print(f"ok    {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures" + (f": {[f[0] for f in failures]}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
