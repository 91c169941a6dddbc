#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. registers every testdata parquet as a DuckDB view
  3. runs each oracle_sql.json entry, compares against the Spark parquet
     dump: columns sorted by name, rows sorted by all columns, exact values.
"""
import json
import sys
import glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO tuple-ization of array cells: the driver's checker
    # sorts rows by all columns as-is and DIES on an array column
    # ("unhashable type: numpy.ndarray"). Round 5's local replica papered
    # over that, so q_chunk_embed was green locally and ERR at the driver.
    # Local behavior must predict driver behavior: flatten array outputs
    # in the query itself (posexplode), never here.
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                failures += 1
                continue
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
            duck_df = canon(con.execute(sql).df())
            if list(spark_df.columns) != list(duck_df.columns):
                print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
                failures += 1
                continue
            if len(spark_df) != len(duck_df):
                print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
                failures += 1
                continue
            eq = True
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                    # BITWISE compare, NaN-aware. The driver hashes value
                    # bit patterns, so 0.0 vs -0.0 is a driver FAIL that a
                    # value compare (0.0 == -0.0 → True) cannot see — that
                    # divergence kept q_vec_cov locally green but driver-red
                    # for a whole round. Local behavior must predict driver
                    # behavior, so compare the int64 views.
                    av = a.to_numpy(dtype="float64")
                    bv = b.to_numpy(dtype="float64")
                    ok_mask = (av.view("int64") == bv.view("int64")) | (
                        np.isnan(av) & np.isnan(bv))
                    same = bool(ok_mask.all())
                    if not same:
                        eq = False
                        idx = np.flatnonzero(~ok_mask)[:3]
                        print(f"FAIL {name}: col {c} diverges bitwise, e.g. "
                              f"{[(repr(av[i]), repr(bv[i])) for i in idx]}")
                    continue
                try:
                    same = a.equals(b) or (a.astype("float64").sub(b.astype("float64")).abs().max() == 0.0)
                except (TypeError, ValueError):
                    same = list(a) == list(b)
                if not same:
                    eq = False
                    mism = (a != b) & ~(a.isna() & b.isna())
                    idx = mism[mism].index[:3]
                    print(f"FAIL {name}: col {c} diverges, e.g. {[(a[i], b[i]) for i in idx]}")
            if eq:
                print(f"ok   {name} ({len(spark_df)} rows)")
            else:
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
    missing = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if "/oracle" not in d
               and d.split("/")[-1] not in oracle]
    if missing:
        print(f"note: queries without oracle (rows-only in driver): {sorted(missing)}")
        for q in sorted(missing):
            files = glob.glob(f"{out_dir}/{q}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            if n == 0:
                print(f"FAIL {q}: rows-only query produced 0 rows")
                failures += 1
    print(f"{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
