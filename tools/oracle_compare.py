#!/usr/bin/env python3
"""Replicate the driver's DuckDB oracle compare over /tmp/verify_out."""
import duckdb, json, os, sys, glob

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
green = rows_only = red = 0
for q in sorted(os.listdir(out)):
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        continue
    spark_glob = os.path.join(d, "*.parquet")
    try:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
    except Exception as e:
        # a query that crashed mid-write leaves an unreadable dir — mark it
        # RED and keep going rather than aborting the whole compare
        print(f"{q:>24}: RED unreadable output ({e})")
        red += 1
        continue
    if q not in oracles:
        status = "rows-only" if n > 0 else "rows-only-EMPTY"
        rows_only += 1
        print(f"{q:>24}: {status} ({n} rows)")
        continue
    try:
        con.execute(f"CREATE OR REPLACE VIEW __spark AS SELECT * FROM read_parquet('{spark_glob}')")
        con.execute(f"CREATE OR REPLACE VIEW __oracle AS ({oracles[q]})")
        scols = [r[0] for r in con.execute("DESCRIBE __spark").fetchall()]
        ocols = [r[0] for r in con.execute("DESCRIBE __oracle").fetchall()]
        if sorted(scols) != sorted(ocols):
            print(f"{q:>24}: RED schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            red += 1
            continue
        # The DRIVER's compare is pandas sort_values over every column and
        # crashes on unhashable cells (numpy arrays) — r9's q54d went red
        # at the gate while this differ's EXCEPT ALL passed it. Flag any
        # oracle-checked query projecting nested types so the local gate
        # PREDICTS the driver instead of diverging from it.
        stypes = {r[0]: r[1] for r in con.execute("DESCRIBE __spark").fetchall()}
        nested = [c for c, t in stypes.items()
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
        if nested:
            print(f"{q:>24}: RED driver-incompatible projection: nested "
                  f"column(s) {nested} (pandas compare cannot hash array "
                  f"cells — emit a scalar encoding, SURVEY §7.5b)")
            red += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(scols))
        d1 = con.execute(f"SELECT count(*) FROM (SELECT {cols} FROM __spark EXCEPT ALL SELECT {cols} FROM __oracle)").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (SELECT {cols} FROM __oracle EXCEPT ALL SELECT {cols} FROM __spark)").fetchone()[0]
        if d1 == 0 and d2 == 0:
            print(f"{q:>24}: GREEN ({n} rows)")
            green += 1
        else:
            print(f"{q:>24}: RED diff spark-only={d1} oracle-only={d2} (n={n})")
            red += 1
    except Exception as e:
        print(f"{q:>24}: RED error {e}")
        red += 1

print(f"\nTOTAL: {green} green, {rows_only} rows-only, {red} red")
if red > 0:
    sys.exit(1)
