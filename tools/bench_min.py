#!/usr/bin/env python3
"""Combine / clean bench_out JSONs for artifact generation.

Modes:
  --strip q1,q2 IN OUT     copy IN with the named queries removed (used to
                           drop queries whose implementation changed after
                           the run — their times describe dead code and must
                           come from post-change re-measure files instead)
  --merge OUT IN1 IN2 ...  per-query MIN across inputs (failures < 0
                           ignored); 'sf' must agree across inputs. Emits
                           the same shape Bench writes so ratio_table.py
                           can consume the result directly.
"""
import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strip")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("paths", nargs="+")
    args = ap.parse_args()

    if args.strip is not None:
        drop = set(args.strip.split(","))
        src, dst = args.paths
        with open(src) as f:
            b = json.load(f)
        for section in ("queries", "first_run", "attempts"):
            if section in b:
                b[section] = {k: v for k, v in b[section].items() if k not in drop}
        b["value"] = sum(v for v in b.get("queries", {}).values() if v >= 0)
        with open(dst, "w") as f:
            json.dump(b, f)
        print(f"stripped {sorted(drop)} -> {dst} ({len(b['queries'])} queries)")
        return

    if args.merge:
        out, ins = args.paths[0], args.paths[1:]
        best, sfs = {}, set()
        for p in ins:
            with open(p) as f:
                b = json.load(f)
            sfs.add(b.get("sf", "?"))
            for k, v in b.get("queries", {}).items():
                if v >= 0:
                    best[k] = min(best.get(k, float("inf")), v)
        if len(sfs) > 1:
            sys.exit(f"inputs disagree on sf: {sorted(sfs)}")
        merged = {"metric": "total", "value": sum(best.values()), "unit": "sec",
                  "queries": best, "sf": sfs.pop(), "inputs": ins}
        with open(out, "w") as f:
            json.dump(merged, f)
        print(f"merged {len(ins)} files -> {out} ({len(best)} queries, "
              f"total {merged['value']:.1f}s)")
        return

    sys.exit("pass --strip or --merge")


if __name__ == "__main__":
    main()
