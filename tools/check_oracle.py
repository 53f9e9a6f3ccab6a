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
import time

import duckdb
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))

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
    oracle_secs = {}
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
        t0 = time.monotonic()
        want = con.execute(sql).df()
        t_oracle = time.monotonic() - t0
        oracle_secs[name] = t_oracle
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
    for name, t in oracle_secs.items():
        results[name]["oracle_sec"] = round(t, 3)
    print(f"\n{n_pass} pass, {n_fail} fail")

    # ---- oracle-duration budget (round-10 verdict item 1) ----
    # The official gate died twice (r08/r09 CORRECTNESS = `{}`) from
    # pathologically slow oracles (q201's inlined CTE chain: 548 s
    # alone at sf0.01; o71's struct min/max: 151.7 s at sf0.1) and was
    # recovered by hand-timing every oracle. This ASSERTS the budget
    # so a regression fails the gauntlet instead of silently zeroing
    # the next round's gate. Budgets live in driver_contract.json and
    # are enforced at the driver gate's SF only (other SFs report
    # timings but don't fail — absolute numbers don't transfer).
    budget = json.load(
        open(os.path.join(HERE, "driver_contract.json"))).get(
        "oracle_budget", {})
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = sum(oracle_secs.values())
    if oracle_secs:
        slow = sorted(oracle_secs.items(), key=lambda t: -t[1])[:5]
        print(f"oracle suite: {total:.1f}s total over {len(oracle_secs)} "
              "queries; slowest: "
              + ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    budget_fail = 0
    if budget and sf == budget.get("enforced_sf") and \
            os.environ.get("CHECK_ORACLE_NO_BUDGET") != "1":
        # env overrides exist to let the gauntlet PROVE the failure
        # path fires (seeded-violation check), not for loosening
        each_max = float(os.environ.get(
            "CHECK_ORACLE_BUDGET_EACH", budget["each_sec"]))
        total_max = float(os.environ.get(
            "CHECK_ORACLE_BUDGET_TOTAL", budget["total_sec"]))
        for name, t in sorted(oracle_secs.items()):
            if t > each_max:
                budget_fail += 1
                print(f"BUDGET VIOLATION: oracle {name} took {t:.1f}s "
                      f"(> {each_max}s at sf{sf}) - a DuckDB pathology "
                      "(unmaterialized multi-ref CTE? struct min/max?) "
                      "that can zero the official gate")
        if total > total_max:
            budget_fail += 1
            print(f"BUDGET VIOLATION: oracle suite total {total:.1f}s "
                  f"(> {total_max}s at sf{sf})")
        if not budget_fail:
            print(f"oracle budget OK (each <= {each_max}s, "
                  f"total <= {total_max}s at sf{sf})")

    out = os.environ.get("CHECK_ORACLE_JSON")
    if out:
        art = {
            "round": int(os.environ.get("CHECK_ORACLE_ROUND", "0")),
            "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "note": os.environ.get("CHECK_ORACLE_NOTE", ""),
            "n_pass": n_pass, "n_fail": n_fail,
            "oracle_total_sec": round(total, 1),
            "oracle_budget_violations": budget_fail,
            "queries": results,
        }
        with open(out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {out}")
    return 1 if (n_fail or budget_fail) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
