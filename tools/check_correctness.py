#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet) + oracle_sql.json, runs the
oracle SQL in DuckDB with views named after the star-schema tables over
<sfDir>/*.parquet, then compares: schema (column names, sorted), row count,
and cell-exact values after sorting columns by name and rows by all columns.
Stricter than any plausible driver compare — if this passes, the driver's
hash compare passes. Exit 1 on any mismatch.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures, passed, skipped = [], [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # A query that THREW in Verify leaves no output dir at all — without this
    # check it would silently vanish from the report instead of failing.
    for name in sorted(set(oracle) - set(names)):
        failures.append((name, "declared oracle but no Verify output (query threw?)"))
    # Fitted-oracle queries (s3/s8/s9 families) register their SQL at fit
    # time, so a fit-time throw leaves neither an output NOR an oracle entry
    # and the check above can't see it. Verify's attempted.json manifest
    # closes that hole: every attempted query must have produced an output.
    attempted_path = os.path.join(out_dir, "attempted.json")
    if os.path.exists(attempted_path):
        with open(attempted_path) as f:
            attempted = json.load(f)
        for name in sorted(set(attempted) - set(names) - set(oracle)):
            failures.append((name, "attempted but produced neither output nor "
                             "oracle (threw during fit?)"))
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            failures.append((name, "no spark parquet output"))
            continue
        # Lint: DECIMAL-typed OUTPUT columns are banned by convention — final
        # columns must be re-quantized and CAST AS DOUBLE (decimal casts of
        # doubles diverge between engines at ulp level; see sql_frontend4's
        # round-4 hash mismatch). DECIMAL is fine as an internal sum carrier.
        dec = [f"{r[0]} is {r[1]}" for r in
               con.sql(f"DESCRIBE SELECT * FROM '{spark_glob}'").fetchall()
               if r[1].upper().startswith("DECIMAL")]
        if dec:
            failures.append((name, "DECIMAL output column (cast to DOUBLE): "
                             + "; ".join(dec)))
            continue
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{spark_glob}'").fetchone()[0]
            skipped.append((name, n))
            continue
        try:
            srel = con.sql(f"SELECT * FROM '{spark_glob}'")
            scols = sorted(srel.columns)
            sdf = srel.df()[scols]
            orel = con.sql(oracle[name])
            ocols = sorted(orel.columns)
            odf = orel.df()[ocols] if ocols == scols else orel.df()
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            continue
        if scols != ocols:
            failures.append((name, f"schema mismatch: spark={scols} oracle={ocols}"))
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"row count: spark={len(sdf)} oracle={len(odf)}"))
            continue
        # Driver hashes stringified values, so dtype KIND drift (e.g. DuckDB
        # HUGEINT -> float64 "123.0" vs Spark BIGINT "123") fails there even
        # when == passes here. Flag kind mismatches; int width drift is fine.
        kindneq = [f"col {c} dtype kind: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                   for c in scols if sdf[c].dtype.kind != odf[c].dtype.kind]
        # Kind drift is a failure (driver hashes stringified values), but for
        # numeric-only drift (e.g. int64 vs float64) fall through to the value
        # compare so the report also shows any actual cell differences. If a
        # non-numeric kind is involved (object vs int), the two frames sort in
        # different orders (lexicographic vs numeric) and a row-aligned value
        # diff would report phantom differences — stop at the kind note.
        numeric = "iufb"
        if any(sdf[c].dtype.kind not in numeric or odf[c].dtype.kind not in numeric
               for c in scols if sdf[c].dtype.kind != odf[c].dtype.kind):
            failures.append((name, "; ".join(kindneq)))
            continue
        ssort = sdf.sort_values(scols, ignore_index=True)
        osort = odf.sort_values(ocols, ignore_index=True)
        neq = list(kindneq)
        for c in scols:
            a, b = ssort[c], osort[c]
            eq = (a == b) | (a.isna() & b.isna())
            # container/object columns: fall back to string compare
            if eq.dtype != bool:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                neq.append(f"col {c} differs at row {i}: spark={a[i]!r} oracle={b[i]!r} "
                           f"({int((~eq).sum())} rows differ)")
        if neq:
            failures.append((name, "; ".join(neq)))
        else:
            passed.append((name, len(sdf)))

    for n, rows in passed:
        print(f"PASS  {n} ({rows} rows)")
    for n, rows in skipped:
        print(f"SKIP  {n} (no oracle; {rows} rows > 0: {rows > 0})")
    for n, msg in failures:
        print(f"FAIL  {n}: {msg}")
    print(f"\n{len(passed)} passed, {len(skipped)} rows-only, {len(failures)} failed")
    if json_out:
        # driver-format per-query record, so committed sf0.1 artifacts read
        # like CORRECTNESS_r{N}.json
        rec = {}
        for n, rows in passed:
            rec[n] = {"rows_match": True, "schema_match": True,
                      "hash_match": True, "spark_rows": rows,
                      "oracle_rows": rows, "err": None}
        for n, rows in skipped:
            rec[n] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "spark_rows": rows,
                      "oracle_rows": None,
                      "err": "rows-only by design (no oracle)"}
        for n, msg in failures:
            rec[n] = {"rows_match": False, "schema_match": False,
                      "hash_match": False, "spark_rows": None,
                      "oracle_rows": None, "err": msg}
        with open(json_out, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
