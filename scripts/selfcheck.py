#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare to the parquet the Verify
main dumped. Columns sorted by name; values hashed after normalization.
Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def frame_sig(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), out

fails = ok = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"MISS  {name}: no spark output")
        fails += 1
        continue
    try:
        oc = con.execute(sql)
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
        sc = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
    except Exception as e:
        print(f"ERR   {name}: {e}")
        fails += 1
        continue
    oc_sig = frame_sig(orows, ocols)
    sc_sig = frame_sig(srows, scols)
    if oc_sig[0] != sc_sig[0]:
        print(f"FAIL  {name}: columns {sc_sig[0]} != oracle {oc_sig[0]}")
        fails += 1
    elif len(oc_sig[1]) != len(sc_sig[1]):
        print(f"FAIL  {name}: rows {len(sc_sig[1])} != oracle {len(oc_sig[1])}")
        fails += 1
    elif oc_sig[1] != sc_sig[1]:
        # ordered compare first; if row order differs but content same, note it
        if sorted(oc_sig[1]) == sorted(sc_sig[1]):
            print(f"WARN  {name}: same multiset, different row order")
            ok += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(sorted(oc_sig[1]), sorted(sc_sig[1]))) if a != b)
            print(f"FAIL  {name}: first value diff at sorted-row {bad}:")
            print(f"      oracle: {sorted(oc_sig[1])[bad]}")
            print(f"      spark : {sorted(sc_sig[1])[bad]}")
            fails += 1
    else:
        print(f"OK    {name} ({len(srows)} rows)")
        ok += 1
print(f"\n{ok} ok, {fails} failed")
sys.exit(1 if fails else 0)
