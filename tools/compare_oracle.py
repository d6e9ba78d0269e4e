#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the declared oracle SQL in DuckDB over the same parquet
tables and compare results (column-name-sorted, row-order-insensitive,
small float tolerance). Dev tool only — not part of the library."""
import json, math, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for tname in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 6)
    return v

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(canon(r[i]) for i in order) for r in rows], key=repr)

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sdesc = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sdesc.description]; srows = sdesc.fetchall()
        odesc = con.execute(oracle[name])
        ocols = [d[0] for d in odesc.description]; orows = odesc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}"); fails += 1; continue
    s, o = norm(srows, scols), norm(orows, ocols)
    if len(s) != len(o):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(s, o) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(s)} mismatched rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
        fails += 1
    else:
        print(f"ok   {name} ({len(s)} rows)")
extra = [q for q in glob.glob(f"{out_dir}/q_*") if q.split("/")[-1] not in oracle]
for q in extra:
    n = len(glob.glob(q + "/*.parquet"))
    print(f"rows-only {q.split('/')[-1]}: {'ok' if n else 'NO OUTPUT'}")
print(f"\n{fails} failures / {len(oracle)} oracled queries")
sys.exit(1 if fails else 0)
