#!/usr/bin/env python3
"""Local replica of the driver's duckdb-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views named after the tables
in <sfDir>, and compares schemas + values (columns sorted by name, rows
sorted) similarly to the driver. Exit nonzero on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> iso str, floats keep
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            failures.append((name, "spark output missing"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            continue
        bad = None
        for c in g.columns:
            gv, wv = list(g[c]), list(w[c])
            for i, (x, y) in enumerate(zip(gv, wv)):
                xx = None if x is None or (isinstance(x, float) and math.isnan(x)) else x
                yy = None if y is None or (isinstance(y, float) and math.isnan(y)) else y
                if xx is None and yy is None:
                    continue
                if xx is None or yy is None or not values_equal(x, y):
                    bad = f"col {c} row {i}: spark={x!r} oracle={y!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK   {name} ({len(g)} rows)")
    extra = set()
    for d in Path(out_dir).iterdir():
        if d.is_dir() and d.name not in oracle:
            extra.add(d.name)
    for name in sorted(extra):
        print(f"  rows-only {name}")
    if failures:
        for name, why in failures:
            print(f"  FAIL {name}: {why}")
        sys.exit(1)
    print(f"all {len(oracle)} oracled queries match ({len(extra)} rows-only)")


if __name__ == "__main__":
    main()
