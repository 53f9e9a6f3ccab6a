#!/usr/bin/env python3
"""DuckDB-dialect lint for the oracle SQL registry (round-10 verdict
item 5).

The two oracle pathologies that zeroed (r08/r09) or nearly zeroed the
official correctness gate, folded into an executable check instead of
scattered comments:

  1. MULTI-REFERENCED CTE WITHOUT `AS MATERIALIZED` - DuckDB inlines
     CTEs by default, so a CTE referenced N times is re-evaluated N
     times (combinatorially when chained: q201's peeling chain cost
     548 s alone at sf0.01). Convention: any CTE referenced more than
     once in FROM/JOIN position gets `AS MATERIALIZED`. Statements
     using `WITH RECURSIVE` are exempt wholesale - the hint is illegal
     on recursive members.
  2. STRUCT MIN/MAX - `min({'n': n, 'f': f})` executes catastrophically
     slowly in DuckDB (o71: 151.7 s on 600k rows at sf0.1 vs 0.9 s for
     the equivalent two-pass join respelling). Flag min/max over a
     struct literal or struct_pack.

The rest of the dialect checklist is convention-only (not mechanically
lintable, kept here for reference): Spark integer `div` vs DuckDB `//`;
list_reduce/aggregate lambda field ORDER must match between dialects;
Spark regex is Java (backrefs OK) vs DuckDB RE2 (no backrefs); Spark
`shiftleft` wraps the shift amount mod 64 silently while DuckDB `<<`
raises (cap shift amounts); CASE abstention lanes must test
`x.id IS NULL OR ...` - a COALESCE around CASE..ELSE is dead.

BASELINE: the pre-lint registry contains ~320 multi-referenced CTEs
that are all cheap (the full 261-oracle suite runs in ~26 s at sf0.01
with every single oracle under the 10 s budget check_oracle.py now
enforces) - blanket-materializing them would be WRONG, not just churn:
a DuckDB materialized CTE is an optimization fence (no filter/projection
pushdown into it), so the hint only pays when the CTE is expensive AND
multiply evaluated. Those existing (query, cte) pairs are grandfathered
in tools/lint_oracles_baseline.json; the lint fails on any violation
NOT in the baseline, i.e. it is strict for every NEW oracle, and the
duration budget remains the backstop for grandfathered ones. Struct
min/max has no baseline entries (o71 was respelled) and is strict
everywhere.

Usage:
  python3 tools/lint_oracles.py <oracle_sql.json | verify_out_dir>
  python3 tools/lint_oracles.py --write-baseline <oracle_sql.json | dir>
  python3 tools/lint_oracles.py --selftest

Exit 0 = clean (modulo baseline); exit 1 with per-query violations.
"""
import json
import os
import re
import sys

# CTE definitions only appear as `name AS [MATERIALIZED] (` inside a
# WITH list; derived-table aliases are spelled `(...) AS name`, so the
# pattern is unambiguous in practice.
CTE_DEF = re.compile(
    r"\b(\w+)\s+AS\s+(MATERIALIZED\s+|NOT\s+MATERIALIZED\s+)?\(",
    re.IGNORECASE)
STRUCT_MINMAX = re.compile(
    r"\b(min|max)\s*\(\s*(\{|struct_pack\b)", re.IGNORECASE)


def lint_sql(name: str, sql: str):
    """Returns (stable_key, message) violation pairs for one oracle."""
    out = []
    if STRUCT_MINMAX.search(sql):
        out.append((
            f"{name}:struct_minmax",
            f"{name}: struct MIN/MAX (the o71 pathology - 151.7s on "
            "600k rows; respell as a two-pass min/max-line join)"))
    if re.search(r"\bWITH\s+RECURSIVE\b", sql, re.IGNORECASE):
        return out  # MATERIALIZED is illegal on recursive members
    for m in CTE_DEF.finditer(sql):
        cte, hint = m.group(1), m.group(2)
        # references in table position only (FROM x / JOIN x) - counting
        # every identifier occurrence would false-positive on column
        # qualifications like cte.col of a single use
        refs = len(re.findall(
            rf"\b(?:FROM|JOIN)\s+{re.escape(cte)}\b", sql, re.IGNORECASE))
        if refs > 1 and not hint:
            out.append((
                f"{name}:cte:{cte}",
                f"{name}: CTE '{cte}' referenced {refs}x without AS "
                "MATERIALIZED (DuckDB inlines -> re-evaluates each "
                "reference; the q201 pathology, 548s at sf0.01)"))
    return out


def lint_registry(oracle: dict):
    violations = []
    for name in sorted(oracle):
        violations.extend(lint_sql(name, oracle[name]))
    return violations


BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "lint_oracles_baseline.json")


def load_baseline():
    if os.path.isfile(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return set(json.load(f)["grandfathered"])
    return set()


def selftest() -> int:
    """Seeded violations + clean spellings - proves the lint fires."""
    cases = [
        # (sql, expect_violation)
        ("WITH pairs AS (SELECT 1 AS x) SELECT * FROM pairs p1 "
         "JOIN pairs p2 ON p1.x = p2.x", True),
        ("WITH pairs AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM "
         "pairs p1 JOIN pairs p2 ON p1.x = p2.x", False),
        ("WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n + 1 "
         "FROM r WHERE n < 5) SELECT * FROM r JOIN r r2 USING (n)",
         False),
        ("WITH one AS (SELECT 1 AS x) SELECT one.x FROM one", False),
        ("SELECT k, min({'n': n, 'f': f}) FROM t GROUP BY k", True),
        ("SELECT k, MAX(struct_pack(n := n, f := f)) FROM t GROUP BY k",
         True),
        ("SELECT k, min(n), max(f) FROM t GROUP BY k", False),
    ]
    bad = 0
    for i, (sql, expect) in enumerate(cases):
        got = bool(lint_sql(f"case{i}", sql))
        status = "ok" if got == expect else "SELFTEST FAIL"
        if got != expect:
            bad += 1
        print(f"{status} case{i}: expect={'flag' if expect else 'clean'} "
              f"got={'flag' if got else 'clean'}")
    print("selftest " + ("PASSED" if not bad else f"FAILED ({bad})"))
    return 1 if bad else 0


def main(argv) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    if argv[1] == "--selftest":
        return selftest()
    write_baseline = argv[1] == "--write-baseline"
    path = argv[2] if write_baseline else argv[1]
    if os.path.isdir(path):
        path = os.path.join(path, "oracle_sql.json")
    with open(path) as f:
        oracle = json.load(f)
    violations = lint_registry(oracle)
    if write_baseline:
        # struct min/max is NEVER grandfathered - it must be fixed,
        # not baselined
        keys = sorted(k for k, _ in violations
                      if not k.endswith(":struct_minmax"))
        with open(BASELINE_PATH, "w") as f:
            json.dump({
                "comment": "Grandfathered pre-lint multi-ref CTEs (all "
                           "under the check_oracle.py duration budget). "
                           "Do NOT add entries by re-running "
                           "--write-baseline for a new query - fix the "
                           "SQL instead. Shrinking this list is fine.",
                "grandfathered": keys}, f, indent=1)
        print(f"wrote {BASELINE_PATH} with {len(keys)} entries")
        return 0
    baseline = load_baseline()
    fresh = [(k, msg) for k, msg in violations if k not in baseline]
    skipped = len(violations) - len(fresh)
    for _, msg in fresh:
        print(f"ORACLE LINT: {msg}")
    print(f"{len(fresh)} violation(s) over {len(oracle)} oracles"
          + (f" ({skipped} grandfathered in baseline)" if skipped else ""))
    stale = baseline - {k for k, _ in violations}
    if stale:
        print(f"note: {len(stale)} baseline entries no longer fire "
              "(queries fixed/renamed) - baseline can be shrunk")
    return 1 if fresh else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
