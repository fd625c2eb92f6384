#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name and rows by all columns, and
compares values exactly. Dev tooling only — not part of the engine.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                v = float(v)  # Decimal -> exact double compare
            elif isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((x is None, str(x)) for x in t)
    return sorted(out, key=key), sorted(cols)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        s_cols = [d[0] for d in spark_rel.description]
        s_rows = spark_rel.fetchall()
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        sr, sc = canon(s_rows, s_cols)
        orr, oc = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: {len(sr)} rows vs oracle {len(orr)}")
            n_fail += 1
        elif sr != orr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"   spark : {sr[bad]}")
            print(f"   oracle: {orr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
