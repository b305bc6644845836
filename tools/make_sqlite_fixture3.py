#!/usr/bin/env python3
"""Round-11 SQLite fixtures (separate files so earlier committed fixture
bytes stay stable):

- pk_desc.db: the DESC asymmetry of the rowid-alias rule
  (sqlite.org/lang_createtable.html#rowid):
    t_tablepk_desc (id INTEGER, v TEXT, PRIMARY KEY(id DESC))
        -> IS a rowid alias: table-level DESC does NOT disqualify;
           record stores NULL, reader must serve the rowid.
    t_colpk_desc   (id INTEGER PRIMARY KEY DESC, v TEXT)
        -> NOT an alias: column-level DESC disqualifies; values live in
           the record, rowids are unrelated (1/2/3).
  Both insert ids 10/20/30 so a wrong alias decision is visible:
  alias-read-as-record -> NULLs; record-read-as-alias -> 1/2/3.
- journal_hot.db + journal_hot.db-journal: rollback-mode db with a HOT
  journal (valid journal magic), i.e. a crash mid-transaction — the
  reader must refuse.
- journal_cold.db + journal_cold.db-journal: same db with a zero-length
  journal (the normal post-commit state under journal_mode=PERSIST-less
  setups) — safe to read.
"""
import os
import sqlite3

fx = "src/test/resources/fixtures"
os.makedirs(fx, exist_ok=True)

# ---- pk_desc ---------------------------------------------------------------
p = os.path.join(fx, "pk_desc.db")
if os.path.exists(p):
    os.remove(p)
con = sqlite3.connect(p)
cur = con.cursor()
cur.execute("CREATE TABLE t_tablepk_desc (id INTEGER, v TEXT, PRIMARY KEY(id DESC))")
cur.execute("CREATE TABLE t_colpk_desc (id INTEGER PRIMARY KEY DESC, v TEXT)")
for t in ("t_tablepk_desc", "t_colpk_desc"):
    for i in (10, 20, 30):
        cur.execute(f"INSERT INTO {t} (id, v) VALUES (?, ?)", (i, f"row{i}"))
con.commit()
# sanity: confirm stock SQLite agrees on which one aliases the rowid
alias_rows = cur.execute(
    "SELECT id, rowid FROM t_tablepk_desc ORDER BY rowid").fetchall()
assert alias_rows == [(10, 10), (20, 20), (30, 30)], alias_rows
noalias_rows = cur.execute(
    "SELECT id, rowid FROM t_colpk_desc ORDER BY rowid").fetchall()
assert noalias_rows == [(10, 1), (20, 2), (30, 3)], noalias_rows
con.close()

# ---- journal: hot vs cold ---------------------------------------------------
for name in ("journal_hot.db", "journal_cold.db"):
    p = os.path.join(fx, name)
    for f in (p, p + "-journal"):
        if os.path.exists(f):
            os.remove(f)
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    con.execute("INSERT INTO t VALUES (1, 'committed')")
    con.commit()
    con.close()

# hot journal: the 8-byte journal magic + plausible header tail
hot = os.path.join(fx, "journal_hot.db-journal")
with open(hot, "wb") as f:
    f.write(bytes([0xD9, 0xD5, 0x05, 0xF9, 0x20, 0xA1, 0x63, 0xD7]))
    f.write(b"\x00" * 504)  # rest of the 512-byte journal header sector

# cold journal: zero-length file
open(os.path.join(fx, "journal_cold.db-journal"), "wb").close()

for f in ("pk_desc.db", "journal_hot.db", "journal_hot.db-journal",
          "journal_cold.db", "journal_cold.db-journal"):
    fp = os.path.join(fx, f)
    print(f, os.path.getsize(fp))
