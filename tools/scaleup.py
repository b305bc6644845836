#!/usr/bin/env python3
"""Key-offset replication of a testdata SF dir to N x its size (default 10x).

Usage:
  python3 tools/scaleup.py [--base /root/testdata/sf0.1] [--factor 10] \
      [--out target/scale/sf1]

Produces an FK-consistent scaled copy: every fact/dim table is replicated
`factor` times with each replica's keys offset by `i * keyspace` (keyspaces
are contiguous 0-based in the driver data, so replicas never collide and
every FK still joins to exactly one parent). `region`/`nation` are fixed
enumerations and are copied as-is.

Two tables get DECORRELATED payloads so similarity workloads scale the way a
real 10x corpus does instead of the way 10 identical copies do:

- documents.text — every word token is salted with the replica id
  (`foo` -> `foo3` in replica 3). Within-replica near-dup structure is
  preserved exactly; across replicas token sets are disjoint, so shingle /
  minhash / simhash candidate pairs grow linearly with the factor. Unsalted
  replication would put 10 identical copies of every doc in every LSH
  bucket and inflate candidate pairs ~quadratically — an artifact, not a
  measurement.
- embeddings.embedding — replica i's vector is rotated by i positions
  (dim 64 >> factor). Rotations of the same vector are mutually
  near-orthogonal in expectation, so replicas do not become each other's
  nearest neighbors and SRP/IVF bucket occupancy scales linearly.

Writing stays inside the repo (target/ is git-ignored); /root/testdata is
never touched.
"""
import argparse
import os

import duckdb

# table -> (key column -> offset keyspace). Offsets are the driver data's
# contiguous keyspace sizes (max key + 1), asserted against the base dir.
KEYSPACES = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
COPY_AS_IS = ["region", "nation"]
# primary key per table, for the keyspace assertion
PK = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
      "orders": "o_orderkey", "lineitem": "l_orderkey", "events": "event_id",
      "documents": "doc_id", "embeddings": "vec_id"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="target/scale/sf1")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to generate (e.g. "
                         "documents,embeddings for the similarity/dedup "
                         "scale tiers) — the other tables are skipped, not "
                         "copied, so only run queries that read the subset")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    # Large COPYs (lineitem at factor 1000 = 600M rows) buffer the ENTIRE
    # result when DuckDB preserves insertion order — measured 92 GB RSS
    # before the first byte hit disk. Row order in the scaled parquet is
    # irrelevant (every consumer is order-independent and the oracle gate
    # never reads these dirs), so let the writer stream.
    con.execute("SET preserve_insertion_order=false")

    for t in COPY_AS_IS:
        if only is not None and t not in only:
            continue
        src, dst = f"{args.base}/{t}.parquet", f"{args.out}/{t}.parquet"
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        print(f"{t}: copied as-is")

    for t, keys in KEYSPACES.items():
        if only is not None and t not in only:
            continue
        src, dst = f"{args.base}/{t}.parquet", f"{args.out}/{t}.parquet"
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        # keyspace sizes are a contract with the driver data — verify, don't trust
        mx = con.sql(f"SELECT max({PK[t]}) FROM '{src}'").fetchone()[0]
        assert mx < keys[PK[t]], f"{t}.{PK[t]} max {mx} >= keyspace {keys[PK[t]]}"
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} + i * {keys[c]} AS {c}")
            elif t == "documents" and c == "text":
                # salt every word token with the replica id (replica 0 keeps
                # the original text bit-for-bit: '' suffix)
                exprs.append(
                    r"regexp_replace(text, '(\w+)', "
                    r"'\1' || CASE WHEN i = 0 THEN '' ELSE i::VARCHAR END, 'g')"
                    " AS text")
            elif t == "embeddings" and c == "embedding":
                # rotate by i mod dim positions; past one full cycle of
                # rotations (factor > dim) additionally flip the sign of odd
                # components so replica i and replica i-dim are
                # near-orthogonal instead of identical (a bare i-position
                # rotation degenerates to the identity once i >= dim, which
                # would plant exact duplicates of every vector at large
                # factors). i = 0 stays bit-exact. dim is MEASURED from the
                # data, not assumed — a non-64-dim corpus would silently get
                # a wrong rotation otherwise.
                dim = con.sql(
                    f"SELECT len(embedding) FROM '{src}' LIMIT 1").fetchone()[0]
                assert con.sql(
                    f"SELECT count(*) FROM '{src}' WHERE len(embedding) != {dim}"
                ).fetchone()[0] == 0, f"ragged embedding dims in {src}"
                exprs.append(
                    "CASE WHEN i = 0 THEN embedding ELSE "
                    "list_transform("
                    f"  list_concat(embedding[(i % {dim}) + 1:], embedding[:(i % {dim})]),"
                    f"  (x, k) -> CASE WHEN ((i // {dim}) % 2) = 1 AND (k % 2) = 1"
                    "            THEN -x ELSE x END) END"
                    " AS embedding")
            else:
                exprs.append(c)
        sql = (f"COPY (SELECT {', '.join(exprs)} FROM '{src}', "
               f"(SELECT unnest(range({args.factor}))::INT AS i)) "
               f"TO '{dst}' (FORMAT PARQUET)")
        con.execute(sql)
        n0 = con.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        n1 = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        assert n1 == n0 * args.factor, (t, n0, n1)
        print(f"{t}: {n0} -> {n1}")

    total = sum(os.path.getsize(f"{args.out}/{f}") for f in os.listdir(args.out))
    print(f"done: {args.out} ({total / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
