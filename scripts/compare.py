#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sfDir parquet tables, then compares: row count, column names, and a
hash of the value multiset (columns sorted by name, rows sorted).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, float) and v == int(v) and abs(v) < 2**52:
        return v  # keep float identity; int-valued floats == ints in python
    return v


def frame_to_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return names, data


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written dir (ScaleGen octave corpora)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").fetchall()
            sp_cols = [d[0] for d in con.description]
            du = con.execute(sql).fetchall()
            du_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sn, sd = frame_to_key(sp_cols, sp)
        dn, dd = frame_to_key(du_cols, du)
        if sn != dn:
            print(f"FAIL {name}: columns {sn} != {dn}")
            n_fail += 1
        elif len(sd) != len(dd):
            print(f"FAIL {name}: rows {len(sd)} != {len(dd)}")
            n_fail += 1
        elif sd != dd:
            diffs = [i for i, (a, b) in enumerate(zip(sd, dd)) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs at sorted rows {diffs}")
            for i in diffs[:2]:
                print(f"    spark : {sd[i]}")
                print(f"    duckdb: {dd[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sd)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
