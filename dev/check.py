#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: dev/check.py <sf-dir> <verify-out-dir>

For each query in oracle_sql.json: run the oracle in DuckDB over views
named after the parquet tables, load the Spark parquet result, and
compare as exact multisets (column names sorted, EXCEPT ALL both ways).
Exit non-zero if any query mismatches.
"""
import duckdb, json, sys, os, glob

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    spath = f"{out}/{name}"
    if not os.path.isdir(spath):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        con.execute(f"CREATE OR REPLACE TABLE o AS ({sql})")
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:200]}"); fail += 1; continue
    try:
        con.execute(f"CREATE OR REPLACE TABLE sres AS SELECT * FROM read_parquet('{spath}/*.parquet')")
    except Exception as e:
        print(f"FAIL {name}: spark parquet read error: {e}"); fail += 1; continue
    ocols = sorted(r[0] for r in con.execute("DESCRIBE o").fetchall())
    scols = sorted(r[0] for r in con.execute("DESCRIBE sres").fetchall())
    if ocols != scols:
        print(f"FAIL {name}: columns differ  spark={scols}  oracle={ocols}"); fail += 1; continue
    cl = ", ".join(f'"{c}"' for c in ocols)
    n_o = con.execute("SELECT count(*) FROM o").fetchone()[0]
    n_s = con.execute("SELECT count(*) FROM sres").fetchone()[0]
    d1 = con.execute(f"SELECT count(*) FROM (SELECT {cl} FROM sres EXCEPT ALL SELECT {cl} FROM o)").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (SELECT {cl} FROM o EXCEPT ALL SELECT {cl} FROM sres)").fetchone()[0]
    if d1 or d2 or n_o != n_s:
        print(f"FAIL {name}: rows spark={n_s} oracle={n_o}  spark-only={d1} oracle-only={d2}")
        ex = con.execute(f"SELECT {cl} FROM sres EXCEPT ALL SELECT {cl} FROM o LIMIT 3").fetchall()
        ex2 = con.execute(f"SELECT {cl} FROM o EXCEPT ALL SELECT {cl} FROM sres LIMIT 3").fetchall()
        if ex: print(f"   spark-only sample: {ex}")
        if ex2: print(f"   oracle-only sample: {ex2}")
        fail += 1
    else:
        print(f"OK   {name}: {n_s} rows")

missing = [q for q in json.load(open(f"{out}/oracle_sql.json")) if False]
print(f"\n{len(oracle) - fail}/{len(oracle)} queries green")
sys.exit(1 if fail else 0)
