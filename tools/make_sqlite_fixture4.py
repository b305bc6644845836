#!/usr/bin/env python3
"""WAL-REPLAY fixtures (round 12): databases whose correct content requires
reading the -wal sidecar — multi-commit, page-overwrite, and multi-page
frames — plus the expected row sets as JSON for the spec to assert.

- wal_multi.db + -wal: main file checkpointed with generation-1 rows;
  then THREE separate WAL commits: new inserts, an UPDATE of a
  checkpointed row (later-frame-wins on an existing page), and a DELETE.
  The correct view differs from the stale main file in all three ways.
- wal_growth.db + -wal: rows only in the WAL push the db PAST the main
  file's page count (frames for pages beyond EOF).
"""
import json
import os
import shutil
import sqlite3

fx = "src/test/resources/fixtures"
os.makedirs(fx, exist_ok=True)


def build(name, body):
    tmp = os.path.join(fx, "_tmp4.db")
    for f in (tmp, tmp + "-wal", tmp + "-shm"):
        if os.path.exists(f):
            os.remove(f)
    con = sqlite3.connect(tmp)
    con.execute("PRAGMA page_size=1024")
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    expected = body(con)
    con.commit()
    # snapshot BEFORE close (close would checkpoint as the last connection)
    shutil.copy(tmp, os.path.join(fx, name))
    shutil.copy(tmp + "-wal", os.path.join(fx, name + "-wal"))
    con.close()
    for f in (tmp, tmp + "-wal", tmp + "-shm"):
        if os.path.exists(f):
            os.remove(f)
    return expected


def multi(con):
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, f"gen1-{i}") for i in range(1, 21)])
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")  # main now holds gen1
    con.execute("INSERT INTO t VALUES (100, 'gen2-new')")
    con.commit()
    con.execute("UPDATE t SET v = 'gen3-updated' WHERE id = 5")
    con.commit()
    con.execute("DELETE FROM t WHERE id = 6")
    con.commit()
    return con.execute("SELECT id, v FROM t ORDER BY id").fetchall()


def growth(con):
    con.execute("CREATE TABLE g (id INTEGER PRIMARY KEY, v TEXT)")
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")  # tiny main file
    # enough rows to allocate pages beyond the main file's EOF
    con.executemany("INSERT INTO g VALUES (?, ?)",
                    [(i, "x" * 200) for i in range(1, 201)])
    con.commit()
    return con.execute("SELECT count(*), sum(id) FROM g").fetchall()


exp = {
    "wal_multi": [[r[0], r[1]] for r in build("wal_multi.db", multi)],
    "wal_growth": [[r[0], r[1]] for r in build("wal_growth.db", growth)],
}
with open(os.path.join(fx, "wal_expected.json"), "w") as f:
    json.dump(exp, f, indent=1)
for n in ("wal_multi.db", "wal_multi.db-wal", "wal_growth.db",
          "wal_growth.db-wal", "wal_expected.json"):
    print(n, os.path.getsize(os.path.join(fx, n)))
# sanity: the stale main file really lacks the WAL content
con = sqlite3.connect("file:" + os.path.join(fx, "wal_multi.db") +
                      "?immutable=1", uri=True)
print("stale main rows:", con.execute("SELECT count(*) FROM t").fetchone())
