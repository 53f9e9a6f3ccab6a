#!/usr/bin/env python3
"""Driver-gate contract self-check (round-8 verdict item 2).

Round 8's official correctness artifact came back as a literal `{}` —
a driver/harness-side failure that engine-side tests could not catch
because nothing asserted the exact surface the driver consumes. This
tool asserts that surface against the committed schema in
tools/driver_contract.json and fails LOUDLY on any drift:

  1. a graft.Verify output dir: one non-empty parquet dir (with
     _SUCCESS) per registry query; oracle_sql.json that json.load()s,
     whose keys are exactly the dump dirs minus the documented
     rows-only set; every key matching the query-name pattern;
  2. a graft.Bench artifact (BENCH_LAST.json / BENCH_SOLO_*.json):
     one json.loads()-able line carrying every field the driver's
     tail-parse reads, metric/unit pinned, per-query map keys drawn
     from the same namespace.

Usage:
  python3 tools/check_contract.py <verify_out_dir> [bench_json ...]

Exit 0 = contract intact; exit 1 with a per-violation listing otherwise.
Run it after every full Verify run (the closing gauntlet does).
"""
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import lint_oracles  # noqa: E402  (tools/ is not a package)


def load_schema():
    with open(os.path.join(HERE, "driver_contract.json")) as f:
        return json.load(f)


def check_verify_dir(out_dir, schema, errors):
    oracle_path = os.path.join(out_dir, schema["verify_oracle_file"])
    if not os.path.isfile(oracle_path):
        errors.append(f"verify: missing {schema['verify_oracle_file']} "
                      f"in {out_dir}")
        return
    try:
        with open(oracle_path) as f:
            oracle = json.load(f)
    except Exception as e:  # malformed escape = the driver's json.load dies
        errors.append(f"verify: {oracle_path} is not valid JSON: {e}")
        return
    if not isinstance(oracle, dict) or not oracle:
        errors.append(f"verify: {oracle_path} must be a non-empty object")
        return
    pat = re.compile(schema["query_name_pattern"])
    dumps = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(p))
    if not dumps:
        errors.append(f"verify: {out_dir} contains no query dump dirs")
    for d in dumps:
        if not pat.match(d):
            errors.append(f"verify: dump dir '{d}' violates name pattern "
                          f"{schema['query_name_pattern']}")
        full = os.path.join(out_dir, d)
        if not os.path.isfile(os.path.join(full, "_SUCCESS")):
            errors.append(f"verify: dump '{d}' has no _SUCCESS marker")
        if not glob.glob(os.path.join(full, "*.parquet")):
            errors.append(f"verify: dump '{d}' has no parquet part file")
    for k in oracle:
        if not pat.match(k):
            errors.append(f"verify: oracle key '{k}' violates name pattern")
        if not isinstance(oracle[k], str) or not oracle[k].strip():
            errors.append(f"verify: oracle SQL for '{k}' is empty")
    dump_set, oracle_set = set(dumps), set(oracle)
    rows_only = set(schema["rows_only"])
    # oracle keys must all have a dump (a dump may fail at runtime and
    # be absent — the driver records that as a per-query failure, not a
    # contract break — but an oracle entry with NO queries entry is a
    # registry bug the driver would surface as a spurious row).
    for k in sorted(oracle_set - dump_set):
        errors.append(f"verify: oracle entry '{k}' has no dump dir "
                      f"(queries/oracleSql registry drift or runtime fail)")
    for k in sorted(dump_set - oracle_set):
        if k not in rows_only:
            errors.append(f"verify: dump '{k}' has no oracle entry and is "
                          f"not in the documented rows-only set "
                          f"{sorted(rows_only)}")
    for k in sorted(rows_only & oracle_set):
        errors.append(f"verify: '{k}' is declared rows-only but HAS an "
                      f"oracle entry — update driver_contract.json")
    # DuckDB-dialect lint (round-10 verdict item 5): the known
    # gate-killing SQL traps, strict for any oracle not in the
    # committed baseline — see tools/lint_oracles.py
    baseline = lint_oracles.load_baseline()
    for key, msg in lint_oracles.lint_registry(oracle):
        if key not in baseline:
            errors.append(f"verify: oracle lint: {msg}")


def check_bench_json(path, schema, errors):
    if not os.path.isfile(path):
        errors.append(f"bench: {path} does not exist")
        return
    with open(path) as f:
        text = f.read().strip()
    if "\n" in text:
        errors.append(f"bench: {path} is not ONE line "
                      f"(driver tail-parses a single JSON line)")
    # Compact artifacts exist to recover the driver's bounded tail
    # capture (~2000 chars, r01-r09 all `parsed: null`): Bench prints
    # the compact line LAST on stdout and mirrors it to
    # *_compact.json. The tail window must fit the line plus slack
    # for whatever the harness appends after it.
    if path.endswith("_compact.json") and \
            len(text) > schema["bench_compact_max_chars"]:
        errors.append(
            f"bench: {path} is {len(text)} chars, exceeds the "
            f"{schema['bench_compact_max_chars']}-char compact budget "
            f"(driver tail capture is ~2000 chars)")
    try:
        obj = json.loads(text)
    except Exception as e:
        errors.append(f"bench: {path} is not valid JSON: {e}")
        return
    for field in schema["bench_required_fields"]:
        if field not in obj:
            errors.append(f"bench: {path} missing required field '{field}'")
    if obj.get("metric") != schema["bench_metric"]:
        errors.append(f"bench: metric = {obj.get('metric')!r}, expected "
                      f"{schema['bench_metric']!r}")
    if obj.get("unit") != schema["bench_unit"]:
        errors.append(f"bench: unit = {obj.get('unit')!r}, expected "
                      f"{schema['bench_unit']!r}")
    if not isinstance(obj.get("value"), (int, float)):
        errors.append("bench: 'value' must be numeric")
    qs = obj.get("queries")
    if not isinstance(qs, dict) or not qs:
        errors.append("bench: 'queries' must be a non-empty object")
    else:
        pat = re.compile(schema["query_name_pattern"])
        for k, v in qs.items():
            if not pat.match(k):
                errors.append(f"bench: query key '{k}' violates name pattern")
            if not isinstance(v, (int, float)):
                errors.append(f"bench: timing for '{k}' must be numeric")


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    schema = load_schema()
    errors = []
    check_verify_dir(argv[1], schema, errors)
    for bench in argv[2:]:
        check_bench_json(bench, schema, errors)
    if errors:
        for e in errors:
            print(f"CONTRACT VIOLATION: {e}")
        print(f"{len(errors)} violation(s)")
        return 1
    print("contract intact")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
