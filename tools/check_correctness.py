"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compares row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd


def norm_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        col = d[c]
        if col.dtype == object or str(col.dtype).startswith("string"):
            d[c] = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            d[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == bool or str(col.dtype) == "boolean":
            d[c] = col.astype(bool).astype(str)
        elif str(col.dtype).startswith("float"):
            d[c] = col.round(6).map(lambda x: f"{x:.6f}")
        else:
            try:  # astype(errors="ignore") is deprecated in pandas 2.x
                d[c] = col.astype("int64").astype(str)
            except (ValueError, TypeError):
                d[c] = col.astype(str)
    rows = sorted("\x1f".join(r) for r in d.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if os.path.basename(os.path.normpath(sf_dir)) != "sf0.01":
        # the DuckDB side (pre-registered views AND the read_parquet
        # paths baked into oracle_sql strings via ORACLE_SF_DIR) is
        # pinned to sf0.01, exactly like the driver's gate — a Spark
        # run at another scale would silently compare different data
        raise SystemExit(
            f"oracles are pinned to sf0.01 (driver behavior); got {sf_dir}"
        )
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from skewer_spark.session import get_spark

    spark = get_spark(app_name="correctness", silence_window_warn=True)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    # the driver pre-registers these views over the sf0.01 parquet tables
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):7d}  (rows-only check, no oracle)  "
                  f"spark={t1-t0:5.1f}s")
            continue
        odf = con.execute(oracles[name]).df()
        t2 = time.time()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        dtypes_differ = []
        if ok_cols:
            for c in sdf.columns:
                a, b = str(sdf[c].dtype), str(odf[c].dtype)
                # int32 vs int64 and object-vs-string are real skew;
                # report but don't fail (driver behavior unknown)
                if a != b:
                    dtypes_differ.append((c, a, b))
        hs, ho = norm_hash(sdf), norm_hash(odf)
        ok_hash = hs == ho
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if dtypes_differ and status == "OK ":
            print(f"{name:24s} dtypes differ: {dtypes_differ}")
        print(f"{name:24s} {status} rows={len(sdf):7d}/{len(odf):7d} "
              f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else f'{hs}!={ho}'} "
              f"spark={t1-t0:5.1f}s duck={t2-t1:4.1f}s")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print("   spark cols:", sorted(sdf.columns))
                print("   duck  cols:", sorted(odf.columns))
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL QUERIES MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
