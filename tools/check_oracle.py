#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare with the Verify dump
(columns sorted by name, row-order-insensitive hash)."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception as e:
        print(f"view {t}: {e}")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float): return f"{v:.10g}"
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

fail = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); fail += 1; continue
        sp = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        sp_cols = [d[0] for d in con.description]
        du = con.execute(sql).fetchall()
        du_cols = [d[0] for d in con.description]
        if sorted(sp_cols) != sorted(du_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(sp_cols)} duck={sorted(du_cols)}"); fail += 1; continue
        if len(sp) != len(du):
            print(f"{name}: ROWCOUNT spark={len(sp)} duck={len(du)}"); fail += 1; continue
        hs, hd = table_hash(sp, sp_cols), table_hash(du, du_cols)
        if hs != hd:
            print(f"{name}: HASH MISMATCH ({len(sp)} rows)")
            # show first differing rows
            order_s = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            order_d = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
            ss = sorted("\x01".join(norm(r[i]) for i in order_s) for r in sp)
            dd = sorted("\x01".join(norm(r[i]) for i in order_d) for r in du)
            for a, b in zip(ss, dd):
                if a != b:
                    print(f"  spark: {a[:200]!r}\n  duck : {b[:200]!r}"); break
            fail += 1
        else:
            print(f"{name}: OK ({len(sp)} rows)")
    except Exception as e:
        print(f"{name}: ERROR {e}"); fail += 1

print("FAILURES:", fail)
sys.exit(1 if fail else 0)
