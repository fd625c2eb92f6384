#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir> [name ...]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares via pandas ``.df()`` frames — the same
materialization the driver hashes — so a dtype divergence that changes
the printed value (e.g. DuckDB HUGEINT -> float64's "23044.0" vs Spark
int64's "23044") FAILS here exactly as it fails on the driver. Rows are
compared stringified after sorting columns by name and rows by all
columns; width-only dtype differences (int32 vs int64) intentionally
pass, mirroring the driver (q76 precedent). Dev tooling only — not part
of the engine.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_str(df):
    """Stringify with dtype-independent NULL rendering: None (object),
    NaN (float64), NaT (datetime64) and pd.NA all print differently under
    astype(str); mask them to one token so a null never FAILs (or sorts
    differently) just because the two engines picked different dtypes."""
    return df.astype(str).mask(df.isna(), "NULL")


def canon(df):
    """Sort columns by name, rows by all columns; driver-equivalent frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        # stringify sort keys so object columns (e.g. mixed None) stay sortable
        order = to_str(df).sort_values(
            by=list(df.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def compare(name, s_df, o_df):
    s_df, o_df = canon(s_df), canon(o_df)
    if list(s_df.columns) != list(o_df.columns):
        return f"columns {list(s_df.columns)} vs oracle {list(o_df.columns)}"
    if len(s_df) != len(o_df):
        return f"{len(s_df)} rows vs oracle {len(o_df)}"
    # The driver hashes each cell's printed representation: integer widths
    # collapse (int32(5) and int64(5) both print "5") but int-vs-float does
    # NOT (int64 "23044" vs float64 "23044.0") — verified against
    # CORRECTNESS_r02 (q76 int32/int64 passed; q58 int64/float64 failed).
    s_str = to_str(s_df)
    o_str = to_str(o_df)
    if not s_str.equals(o_str):
        for i in range(len(s_str)):
            if not s_str.iloc[i].equals(o_str.iloc[i]):
                s_dt = [str(t) for t in s_df.dtypes]
                o_dt = [str(t) for t in o_df.dtypes]
                dt = [(c, a, b) for c, a, b in zip(s_df.columns, s_dt, o_dt)
                      if a != b]
                hint = f"\n   dtype diffs: {dt}" if dt else ""
                return (f"first diff at sorted row {i}:\n"
                        f"   spark : {tuple(s_str.iloc[i])}\n"
                        f"   oracle: {tuple(o_str.iloc[i])}{hint}")
        return "frames differ (no row-level diff found?)"
    return None


def main(out_dir, sf_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # same contract as graft.Verify's subset arg: a typo'd name must fail
    # loudly, never produce a "0 pass / 0 fail" false green
    unknown = set(only) - set(oracle)
    if unknown:
        raise SystemExit(f"unknown queries (no oracle entry): "
                         f"{', '.join(sorted(unknown))}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            s_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            o_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        err = compare(name, s_df, o_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
