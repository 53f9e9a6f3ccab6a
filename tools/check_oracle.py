#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet (or <name>/ dir) produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB with the testdata
parquet registered as views, sorts columns by name + rows by value, and
hash-compares. Prints PASS/FAIL per query.
"""
import glob
import hashlib
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(repr(v))
            elif hasattr(v, "isoformat"):
                cells.append(v.isoformat())
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(
            path) else [p for p in [path + ".parquet"] if os.path.exists(p)]
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            results[name] = {"status": "fail", "rows": -1}
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        want = con.execute(sql).df()
        ok_schema = sorted(map(str.lower, got.columns)) == sorted(
            map(str.lower, want.columns))
        got.columns = [c.lower() for c in got.columns]
        want.columns = [c.lower() for c in want.columns]
        h_got, h_want = canon(got), canon(want)
        ok = ok_schema and len(got) == len(want) and h_got == h_want
        results[name] = {"status": "pass" if ok else "fail",
                         "rows": len(got)}
        if ok:
            n_pass += 1
            print(f"PASS {name} rows={len(got)}")
        else:
            n_fail += 1
            print(f"FAIL {name}: schema_ok={ok_schema} rows {len(got)} vs "
                  f"{len(want)} hash {h_got[:8]} vs {h_want[:8]}")
            if ok_schema:
                g = got.reindex(sorted(got.columns), axis=1).sort_values(
                    list(sorted(got.columns))).reset_index(drop=True)
                w = want.reindex(sorted(want.columns), axis=1).sort_values(
                    list(sorted(want.columns))).reset_index(drop=True)
                print("  spark:", g.head(3).to_dict("records"))
                print("  duck :", w.head(3).to_dict("records"))
    print(f"\n{n_pass} pass, {n_fail} fail")
    out = os.environ.get("CHECK_ORACLE_JSON")
    if out:
        art = {
            "round": int(os.environ.get("CHECK_ORACLE_ROUND", "0")),
            "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "note": os.environ.get("CHECK_ORACLE_NOTE", ""),
            "n_pass": n_pass, "n_fail": n_fail,
            "queries": results,
        }
        with open(out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
