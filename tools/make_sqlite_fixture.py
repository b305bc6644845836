#!/usr/bin/env python3
"""Generate the committed SQLite test fixture with the stdlib sqlite3.

Two tables:
- vendor_mappings: the reference's exact schema (database.py:61-72), 300
  rows -> multi-page table b-tree (interior + leaf pages exercised), with
  NULLs, unicode, and one >8KB payload row (overflow chain exercised).
- typetest: every record serial type the format defines (ints of each
  width incl. the 6- and 8-byte forms, the 0/1 constants, float64, text,
  blob, NULL).
"""
import os
import sqlite3

out = "src/test/resources/fixtures/vendor_mappings.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA page_size = 1024")  # small pages -> interior b-tree pages
cur.execute("""
    CREATE TABLE vendor_mappings (
        id INTEGER PRIMARY KEY AUTOINCREMENT,
        vendor TEXT UNIQUE NOT NULL,
        gl_account TEXT,
        location TEXT,
        program TEXT,
        funder TEXT,
        department TEXT,
        created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
        updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
    )
""")
cur.execute("CREATE INDEX idx_vendor_name ON vendor_mappings(vendor)")
for i in range(300):
    cur.execute(
        "INSERT INTO vendor_mappings (vendor, gl_account, location, program,"
        " funder, department, created_at, updated_at) VALUES (?,?,?,?,?,?,?,?)",
        (f"Vendor {i:03d} Inc", f"6{i % 9}10", f"LOC{i % 5}",
         None if i % 7 == 0 else f"PROG{i % 3}",
         f"Funder {chr(65 + i % 4)}", "Ops" if i % 2 else "Café Ünïcode",
         "2024-01-01 10:00:00", "2024-06-30 23:59:59"))
# overflow row: payload far beyond one 1KB page
cur.execute(
    "INSERT INTO vendor_mappings (vendor, gl_account) VALUES (?, ?)",
    ("Overflow Vendor " + "x" * 9000, "6999"))
cur.execute("""
    CREATE TABLE typetest (
        k INTEGER PRIMARY KEY,
        i8 INTEGER, i16 INTEGER, i24 INTEGER, i32 INTEGER, i48 INTEGER,
        i64 INTEGER, zero INTEGER, one INTEGER, f REAL, t TEXT, b BLOB,
        missing TEXT
    )
""")
cur.execute(
    "INSERT INTO typetest VALUES (1, 100, 30000, 8000000, 2000000000,"
    " 140000000000000, 9223372036854775807, 0, 1, 3.5, 'héllo🙂',"
    " x'DEADBEEF', NULL)")
cur.execute(
    "INSERT INTO typetest VALUES (2, -100, -30000, -8000000, -2000000000,"
    " -140000000000000, -9223372036854775808, 0, 1, -2.25, '', x'', 'seen')")
con.commit()
con.close()
print("wrote", out, os.path.getsize(out), "bytes")
