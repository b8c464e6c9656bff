#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark parquet dumps in
outDir (columns sorted by name, rows sorted, values normalized)."""
import duckdb, json, sys, math, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# "subset" third arg: compare only queries that Verify actually dumped
# (Verify's optional name filter) instead of failing on missing dirs
subset = len(sys.argv) > 3 and sys.argv[3] == "subset"
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{outdir}/{name}"
    if subset and not os.path.isdir(spark_path):
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:250]}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: column mismatch {gcols} vs {ecols}"); fails += 1; continue
    g = got[gcols].astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().tolist()
    e = exp[ecols].astype(str).apply(lambda r: '|'.join(r), axis=1).sort_values().tolist()
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    if g != e:
        bad = [(a,b) for a,b in zip(g,e) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); fails += 1; continue
    print(f"OK   {name}: {len(g)} rows")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
