#!/usr/bin/env python3
"""Mechanical census of the declared query surface.

Reads the newest CORRECTNESS_r*.json (or a path given as argv[1]) and
prints the totals SURVEY.md §8 must quote. The census is derived from the
driver artifact — never hand-counted — so the survey can't claim green
over a red artifact (the round-6 bookkeeping bug).
"""
import glob
import json
import sys


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else sorted(glob.glob("CORRECTNESS_r*.json"))[-1])
    d = json.load(open(path))
    # an EMPTY artifact is a harness failure, never "0 declared" — the
    # round-15 driver glitch wrote {} while the engine's own sweep was
    # 355/355 green; treating it as zeros would silently erase a round
    if not d:
        print(f"HARNESS-FAILURE: {path} is empty — the driver's verify "
              "pass wrote no per-query results. This is not an engine "
              "signal; re-run graft.Verify + tools/check_oracle.py for "
              "ground truth.")
        sys.exit(2)
    declared = len(d)
    oracled = {k: v for k, v in d.items() if v.get("err") != "no_oracle"}
    green = [k for k, v in oracled.items()
             if v.get("hash_match") and v.get("rows_match")
             and v.get("schema_match")]
    red = sorted(set(oracled) - set(green))
    errs = sorted(k for k, v in d.items()
                  if v.get("err") not in (None, "no_oracle"))
    print(f"artifact: {path}")
    print(f"declared queries: {declared}")
    print(f"oracled: {len(oracled)} ({len(green)} hash-green)")
    print(f"rows-only: {declared - len(oracled)}")
    if red:
        print(f"RED ({len(red)}): {', '.join(red)}")
    if errs:
        print(f"ERRORED ({len(errs)}): {', '.join(errs)}")
    print(f"SURVEY line: **{declared} declared queries — {len(oracled)} "
          f"oracled ({len(green)} hash-green), "
          f"{declared - len(oracled)} rows-only**")


if __name__ == "__main__":
    main()
