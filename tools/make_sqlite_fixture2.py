#!/usr/bin/env python3
"""Round-10 SQLite fixtures (separate from vendor_mappings.db so the
committed round-9 fixture bytes stay stable):

- pk_variants.db (rollback journal): the rowid-alias decision table.
    t_exact   (id INTEGER PRIMARY KEY)        -> alias: record stores NULL
    t_int     (id INT PRIMARY KEY)            -> NOT alias: values in record
    t_bigint  (id BIGINT PRIMARY KEY)         -> NOT alias
    t_tablepk (id INTEGER, ..., PRIMARY KEY(id)) -> alias (table-level form)
  Every table inserts ids 10/20/30 so an alias-vs-record confusion is
  visible (rowids would read 1/2/3).
- wal_pending.db + wal_pending.db-wal: WAL-mode db whose committed rows
  (including the CREATE TABLE) live ONLY in the sidecar — the stale-main
  case the reader must refuse.
- wal_clean.db: WAL-mode header but fully checkpointed, no sidecar — safe.
"""
import os
import shutil
import sqlite3

fx = "src/test/resources/fixtures"
os.makedirs(fx, exist_ok=True)

# ---- pk_variants -----------------------------------------------------------
p = os.path.join(fx, "pk_variants.db")
if os.path.exists(p):
    os.remove(p)
con = sqlite3.connect(p)
cur = con.cursor()
cur.execute("CREATE TABLE t_exact (id INTEGER PRIMARY KEY, v TEXT)")
cur.execute("CREATE TABLE t_int (id INT PRIMARY KEY, v TEXT)")
cur.execute("CREATE TABLE t_bigint (id BIGINT PRIMARY KEY, v TEXT)")
cur.execute("CREATE TABLE t_tablepk (id INTEGER, v TEXT, PRIMARY KEY(id))")
for t in ("t_exact", "t_int", "t_bigint", "t_tablepk"):
    for i in (10, 20, 30):
        cur.execute(f"INSERT INTO {t} (id, v) VALUES (?, ?)", (i, f"row{i}"))
con.commit()
con.close()

# ---- WAL: pending sidecar --------------------------------------------------
tmp = os.path.join(fx, "_tmp_wal.db")
for f in (tmp, tmp + "-wal", tmp + "-shm"):
    if os.path.exists(f):
        os.remove(f)
con = sqlite3.connect(tmp)
con.execute("PRAGMA journal_mode=WAL")
con.execute("PRAGMA wal_autocheckpoint=0")
con.execute("CREATE TABLE pending (k INTEGER PRIMARY KEY, v TEXT)")
con.execute("INSERT INTO pending VALUES (1, 'only-in-wal')")
con.commit()
# copy BEFORE close: the close checkpoint would drain the sidecar
shutil.copy(tmp, os.path.join(fx, "wal_pending.db"))
shutil.copy(tmp + "-wal", os.path.join(fx, "wal_pending.db-wal"))

# ---- WAL: checkpointed, clean ----------------------------------------------
con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
con.close()
shutil.copy(tmp, os.path.join(fx, "wal_clean.db"))
for f in (tmp, tmp + "-wal", tmp + "-shm"):
    if os.path.exists(f):
        os.remove(f)

for f in ("pk_variants.db", "wal_pending.db", "wal_pending.db-wal", "wal_clean.db"):
    fp = os.path.join(fx, f)
    print(f, os.path.getsize(fp))
