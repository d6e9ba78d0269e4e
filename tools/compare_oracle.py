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

# Oracle type lint: the driver's hash is TYPE-sensitive even when values
# match. DuckDB silently widens (sum(BIGINT) -> HUGEINT, including inside
# derived window/arithmetic expressions whose operands were cast) and the
# Spark side can never emit HUGEINT, so any HUGEINT column is a guaranteed
# driver hash-fail: q_concurrency (r9) and q_survival (r11) were both this.
# Binding a relation is lazy — .types does not execute the query.
BAD_TYPES = {"HUGEINT", "UHUGEINT"}
WARN_TYPES = {"UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT"}
def type_lint(name, sql):
    try:
        rel = con.sql(sql)
        cols = list(zip(rel.columns, [str(t) for t in rel.types]))
    except Exception:
        return True  # binding errors surface in the main compare below
    bad = [(c, t) for c, t in cols if t in BAD_TYPES]
    warn = [(c, t) for c, t in cols if t in WARN_TYPES]
    if bad:
        print(f"FAIL {name}: oracle TYPE LINT — {bad} (CAST to BIGINT; driver hash is type-sensitive)")
        return False
    if warn:
        print(f"warn {name}: oracle unsigned cols {warn} (driver may render differently; consider CAST)")
    return True

fails = 0
for name in sorted(oracle):
    if not type_lint(name, oracle[name]):
        fails += 1; continue
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
