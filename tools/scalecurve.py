#!/usr/bin/env python3
"""Render SCALECURVE.md from paired bench_out files at two scales.

Usage:
  python3 tools/scalecurve.py --small A.json [B.json ...] \
      --large C.json [D.json ...] [--factor 10] [--out SCALECURVE.md]

Multiple files per scale are combined with the per-query MIN (the repo's
"best observed quiet time" convention — this box's episodic stalls inflate
single runs by 2-10x, so a min over spaced runs is the only defensible
point estimate). Growth = large_min / small_min; queries growing faster
than `factor` (after a fixed per-job overhead allowance) are flagged.
"""
import argparse
import hashlib
import json
import time


def combined(paths):
    best, sfs = {}, set()
    for p in paths:
        with open(p) as f:
            b = json.load(f)
        sfs.add(b.get("sf", "?"))
        for k, v in b.get("queries", {}).items():
            if v >= 0:
                best[k] = min(best.get(k, float("inf")), v)
    return best, sfs


def md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()[:12]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", nargs="+", required=True)
    ap.add_argument("--large", nargs="+", required=True)
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--out", default="SCALECURVE.md")
    ap.add_argument("--labels", nargs=2, default=["sf0.1", "sf1"],
                    help="column labels for the small/large scales")
    ap.add_argument("--title", default="Empirical scale curve")
    args = ap.parse_args()
    (s, ssf), (l, lsf) = combined(args.small), combined(args.large)
    names = sorted(set(s) & set(l))
    rows = [(n, s[n], l[n], l[n] / s[n]) for n in names]
    rows.sort(key=lambda r: -r[3])

    lines = [f"# {args.title}", ""]
    # provenance from the bench JSONs' own sf field, not a hardcoded pair
    lines.append(f"- data: `{', '.join(sorted(ssf))}` vs "
                 f"`{', '.join(sorted(lsf))}` ({args.factor:g}x rows; "
                 "large side from tools/scaleup.py key-offset replication "
                 "when under target/, decorrelated documents/embeddings)")
    fps = ", ".join(f"`{p}`:{md5(p)}" for p in args.small + args.large)
    lines.append(f"- inputs (md5): {fps}")
    lines.append(f"- per-query MIN over {len(args.small)} small / "
                 f"{len(args.large)} large spaced runs  |  generated "
                 + time.strftime("%Y-%m-%d %H:%M:%S %Z"))
    st, lt = sum(s[n] for n in names), sum(l[n] for n in names)
    lines.append(f"- **totals: {st:.1f} s -> {lt:.1f} s = {lt / st:.1f}x "
                 f"growth at {args.factor:g}x data over {len(names)} queries**")
    lines.append("")
    lines.append(f"| query | {args.labels[0]} s | {args.labels[1]} s | growth | vs linear |")
    lines.append("|---|---:|---:|---:|---|")
    for n, sv, lv, g in rows:
        verdict = ("SUPER-LINEAR" if g > args.factor * 1.2 else
                   "~linear" if g > args.factor * 0.5 else "sub-linear")
        lines.append(f"| {n} | {sv:.2f} | {lv:.2f} | {g:.1f}x | {verdict} |")
    lines.append("")
    lines.append("Reading: growth below the data factor means the fixed "
                 "per-job floor (stage launch, planning, JVM) still dominates "
                 "at the small scale — the operator has headroom. Growth near "
                 "the factor is the expected linear regime. Anything flagged "
                 "SUPER-LINEAR (> 1.2x the data factor) indicates a "
                 "candidate-pair or shuffle-volume blowup and gets a plan "
                 "audit in the round notes.")
    text = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
