"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and an order-insensitive multiset of values (columns sorted by name).

Usage: python scripts/check_oracles.py [sf_dir] [only_query_substr]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def norm_val(v):
    import decimal

    import numpy as np

    if isinstance(v, (bool, np.bool_)):
        return "t" if v else "f"
    if isinstance(v, (float, decimal.Decimal, np.floating)):
        return f"{float(v):.6f}"
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in rows:
        key = "|".join(norm_val(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for tbl in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
            )
        except Exception:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [[r[c] for c in scols] for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"{name}: SPARK ERROR {e}")
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only rows={len(srows)} ({took:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            # fetch via pandas (Arrow), NOT fetchall(): the driver harness
            # fetches through Arrow, where DuckDB HUGEINT becomes float64 —
            # fetchall() masks that class of type-canonicalization mismatch
            # (the r02 agg_lang_stats red cell)
            odf = res.df()
            orows = [list(t) for t in odf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"{name}: ORACLE ERROR {e}")
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sm, om = multiset(srows, scols), multiset(orows, ocols)
        ok_vals = sm == om
        status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
            f"vals={'ok' if ok_vals else 'DIFF'} ({took:.1f}s)"
        )
        if status != "OK":
            failures.append(name)
            if not ok_vals:
                extra_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                extra_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                print(f"   spark-only: {extra_s}")
                print(f"   oracle-only: {extra_o}")
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
