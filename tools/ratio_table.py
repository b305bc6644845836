#!/usr/bin/env python3
"""Generate the per-query engine-vs-oracle ratio table as a markdown artifact.

Usage:
  python3 tools/ratio_table.py <sfDir> <benchOutJson> <oracleSqlJson> [--runs N] [--out RATIOS.md]

Inputs:
  sfDir          parquet table dir the bench ran against (e.g. /root/testdata/sf0.1)
  benchOutJson   the engine's bench_out.json (one JSON object, "queries" map)
  oracleSqlJson  oracle_sql.json from a Verify dump (same query names)

For every benched query that has an oracle, the oracle SQL is timed in DuckDB
(N runs, min reported — the same "best observed" convention Bench uses for
its deferred re-times). Output: a markdown table sorted by ratio descending
(engine slower than oracle first), with totals, written to --out and echoed.

Queries without an oracle are listed separately with engine time only. The
table is a round-over-round diffable artifact: regenerate with one command
after each bench instead of re-deriving ratios by hand.
"""
import argparse
import hashlib
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("bench_out")
    ap.add_argument("oracle_sql")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--out", default="RATIOS.md")
    args = ap.parse_args()

    with open(args.bench_out) as f:
        bench = json.load(f)
    with open(args.oracle_sql) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    engine_times = {k: v for k, v in bench.get("queries", {}).items() if v >= 0}
    rows, no_oracle = [], []
    for name in sorted(engine_times):
        et = engine_times[name]
        sql = oracle.get(name)
        if sql is None:
            no_oracle.append((name, et))
            continue
        best = None
        for _ in range(max(1, args.runs)):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, et, best, et / best if best > 0 else float("inf")))

    rows.sort(key=lambda r: -r[3])
    etot = sum(r[1] for r in rows)
    otot = sum(r[2] for r in rows)

    lines = []
    lines.append("# Engine vs oracle per-query ratios")
    lines.append("")
    lines.append(f"- sf dir: `{args.sf_dir}`  |  bench: `{args.bench_out}`  "
                 f"|  DuckDB runs per query: {args.runs} (min)")
    with open(args.bench_out, "rb") as f:
        bench_md5 = hashlib.md5(f.read()).hexdigest()
    lines.append(f"- bench fingerprint: md5 `{bench_md5}`  |  "
                 f"{len(bench.get('queries', {}))} benched queries  |  "
                 f"generated {time.strftime('%Y-%m-%d %H:%M:%S %Z')}")
    bench_sf = bench.get("sf", "")
    if bench_sf and os.path.normpath(bench_sf) != os.path.normpath(args.sf_dir):
        lines.append(f"- **WARNING: bench ran at `{bench_sf}` but DuckDB is "
                     f"timed at `{args.sf_dir}` — ratios are cross-scale "
                     "and not comparable**")
    lines.append(f"- **totals: engine {etot:.1f} s vs oracle {otot:.1f} s "
                 f"over {len(rows)} oracle-timed queries = "
                 f"{etot / otot:.2f}x**" if otot else "- no oracle rows")
    lines.append("")
    lines.append("| query | engine s | duckdb s | ratio |")
    lines.append("|---|---:|---:|---:|")
    for name, et, ot, ratio in rows:
        lines.append(f"| {name} | {et:.2f} | {ot:.2f} | {ratio:.2f} |")
    if no_oracle:
        lines.append("")
        lines.append("Engine-only (no SQL oracle; gated by golden fixture/spec):")
        lines.append("")
        lines.append("| query | engine s |")
        lines.append("|---|---:|")
        for name, et in no_oracle:
            lines.append(f"| {name} | {et:.2f} |")
    text = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    sys.stdout.write(text)


if __name__ == "__main__":
    main()
