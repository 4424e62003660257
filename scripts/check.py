#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf dir,
and compare schema + rows exactly (columns sorted by name, rows sorted).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # strict type check via duckdb types on both sides
        stypes = dict(zip(spark_cols, [str(t) for t in spark_rel.types]))
        dtypes = dict(zip(duck_cols, [str(t) for t in duck_rel.types]))
        tmism = {c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]}
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a == b:
            if tmism:
                # the driver's gate compares schemas strictly — a type
                # drift that passes here would fail there
                print(f"FAIL {name}: TYPE MISMATCH {tmism}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(a)} rows")
                n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(a)} rows vs duck {len(b)} rows")
            diff_shown = 0
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"   spark-only: {r}")
            for r in list(sb - sa)[:3]:
                print(f"   duck-only:  {r}")
            if len(a) == len(b):
                for ra, rb in zip(a, b):
                    if ra != rb and diff_shown < 3:
                        print(f"   spark={ra}\n   duck ={rb}")
                        diff_shown += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
