#!/usr/bin/env python3
"""Merge an incremental check_oracle report into an existing
CORRECTNESS_sf*.json (same record shape as emit_correctness.py) — used
when a round re-gates only its changed/new queries at the scale fixtures
instead of re-running the whole 340+-query suite.

Usage: python3 tools/merge_correctness.py report.txt CORRECTNESS_sf1.json <sf>
"""
import json
import re
import sys


def main():
    report, dst, sf = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(dst) as f:
        out = json.load(f)
    merged = 0
    for line in open(report):
        m = re.match(r"(PASS|FAIL|SKIP)\s+(\S+)\s+(.*)", line.rstrip())
        if not m:
            continue
        status, name, detail = m.groups()
        if status == "SKIP":
            out[name] = {"skipped": True, "reason": detail, "sf": sf}
            merged += 1
            continue
        ok = status == "PASS"
        rec = {"rows_match": ok, "schema_match": ok, "hash_match": ok,
               "sf": sf}
        if detail.startswith("rows-only"):
            rec["check"] = "rows_only"
        if not ok:
            rec["err"] = detail
        if detail.startswith("VACUOUS"):
            rec.update({"rows_match": True, "schema_match": True,
                        "hash_match": True, "check": "vacuous",
                        "err": detail})
        elif detail.startswith("SCHEMA MISMATCH"):
            rec["rows_match"] = rec["hash_match"] = False
        elif detail.startswith("ROWCOUNT MISMATCH"):
            rec["schema_match"] = True
            rec["hash_match"] = False
        elif detail.startswith(("VALUE MISMATCH", "DTYPE DRIFT")):
            rec["schema_match"] = True
            rec["rows_match"] = True
        out[name] = rec
        merged += 1
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    n_ok = sum(1 for r in out.values() if not r.get("skipped")
               and r["rows_match"] and r["schema_match"] and r["hash_match"])
    n_skip = sum(1 for r in out.values() if r.get("skipped"))
    print(f"merged {merged} rows into {dst}: now {n_ok}/{len(out)} ok, "
          f"{n_skip} skipped")


if __name__ == "__main__":
    main()
