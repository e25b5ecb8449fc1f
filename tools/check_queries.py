"""Local stand-in for the driver's CORRECTNESS gate.

Runs __spark_entry__.queries() against oracle_sql() on the same
parquet tables (default /root/testdata/sf0.01), compares row counts,
column names, and values (columns sorted by name, rows sorted by all
columns), and prints one status line per query.

Usage: python tools/check_queries.py [query ...]   (no args = all)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _normalize(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(str))
    return df


def _values_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        for x, y in zip(a[c], b[c]):
            if x is None and y is None:
                continue
            try:
                if isinstance(x, float) or isinstance(y, float):
                    fx, fy = float(x), float(y)
                    if math.isnan(fx) and math.isnan(fy):
                        continue
                    if not math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-9):
                        return False
                    continue
            except (TypeError, ValueError):
                pass
            if str(x) != str(y):
                return False
    return True


def main(argv):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("check_queries").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = argv or list(qs)
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {ex}"[:500])
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        rows_ok = len(sdf) == len(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        vals_ok = (rows_ok and cols_ok and
                   _values_equal(_normalize(sdf), _normalize(odf)))
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "MISMATCH"
        print(f"{name}: {status} spark_rows={len(sdf)} oracle_rows={len(odf)}"
              f" cols_ok={cols_ok} vals_ok={vals_ok}")
        if status != "OK":
            failed.append(name)
            if not cols_ok:
                print(f"  spark cols: {sorted(sdf.columns)}")
                print(f"  oracle cols: {sorted(odf.columns)}")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
