#!/usr/bin/env python3
"""Dev-loop oracle compare: mimic the driver's DuckDB check.
Loads oracle_sql.json, runs each SQL in DuckDB against /root/testdata/<sf>,
compares (sorted columns, sorted rows, stringified values) against the
parquet each Spark query wrote."""
import duckdb, json, sys, glob, math
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def s(v):
        if v is None or (isinstance(v, float) and math.isnan(v)): return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15: return str(int(v))
            return f"{v:.6g}"
        return str(v)
    rows = sorted(tuple(s(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = norm(con.execute(sql).df())
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = norm(pd.concat([pd.read_parquet(f) for f in files]))
    if got == want:
        print(f"OK    {name} ({len(got)} rows)")
    else:
        msg = f"MISMATCH rows got={len(got)} want={len(want)}"
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        fails.append((name, f"{msg} first-diffs={diff}"))
for name, why in fails:
    print(f"FAIL  {name}: {why[:400]}")
no_oracle = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*")
             if '/' in d and d.split('/')[-1] not in oracle
             and not d.endswith('.json')]
print("rows-only (no oracle):", sorted(no_oracle))
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle checks passed")
