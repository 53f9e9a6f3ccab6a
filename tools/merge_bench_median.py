#!/usr/bin/env python3
"""Median-of-3 closing bench (round-8 verdict item 8).

Machine-state spread has twice produced false round-over-round perf
scares (+15-25% uniform drift on untouched queries). This merges N solo
bench runs into one artifact with the PER-QUERY MEDIAN, which is robust
to one polluted run; the output keeps the driver-facing bench schema
(check_contract.py validates it) plus provenance extras.

Usage: python3 tools/merge_bench_median.py OUT RUN1 RUN2 RUN3 ...
"""
import json
import os
import statistics
import sys


def compact_budget():
    """The driver tail window budget from tools/driver_contract.json.

    Enforced HERE at write time (round-10 ADVICE), not only when
    someone remembers to pass the _compact.json path to
    check_contract.py.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "driver_contract.json")) as f:
        return json.load(f)["bench_compact_max_chars"]


def main(out, runs):
    arts = [json.loads(open(p).read().strip()) for p in runs]
    names = set(arts[0]["queries"])
    for a in arts[1:]:
        if set(a["queries"]) != names:
            sys.exit("bench runs cover different query sets")
    med = {}
    for n in sorted(names):
        vals = [a["queries"][n] for a in arts]
        if any(v < 0 for v in vals):
            med[n] = -1.0  # a failure in any run is a failure
        else:
            med[n] = statistics.median(vals)
    failed = [n for n, v in med.items() if v < 0]
    merged = {
        "metric": "total",
        "value": sum(v for v in med.values() if v >= 0),
        "unit": "sec",
        "queries": med,
        "failed": failed,
        "sf": arts[0]["sf"],
        "loadavg_start": arts[0]["loadavg_start"],
        "loadavg_end": arts[-1]["loadavg_end"],
        "cpus": arts[0]["cpus"],
        "concurrent": any(a.get("concurrent", False) for a in arts),
        "aggregation": f"per-query median of {len(arts)} solo runs",
        "run_totals": [a["value"] for a in arts],
    }
    with open(out, "w") as f:
        f.write(json.dumps(merged, separators=(",", ":")) + "\n")
    # compact twin (the tail-window-sized artifact Bench itself also
    # writes): top-10 slowest queries only, no run provenance
    top = sorted(((n, v) for n, v in med.items() if v >= 0),
                 key=lambda t: -t[1])[:10]
    compact = dict(merged)
    compact["queries"] = dict(top)
    compact["queries_total"] = len(med)
    del compact["run_totals"]
    cpath = (out[:-5] if out.endswith(".json") else out) + "_compact.json"
    line = json.dumps(compact, separators=(",", ":"))
    budget = compact_budget()
    if len(line) > budget:
        sys.exit(f"compact line is {len(line)} chars, exceeds the "
                 f"{budget}-char bench_compact_max_chars budget "
                 f"(driver tail capture is ~2000 chars) - not writing "
                 f"{cpath}")
    with open(cpath, "w") as f:
        f.write(line + "\n")
    print(f"wrote {out}: total={merged['value']:.1f}s "
          f"run_totals={[round(v, 1) for v in merged['run_totals']]} "
          f"(+ {cpath})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
