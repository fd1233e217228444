#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped engine is Scala — this just lets us validate oracle parity
before the driver does).

Usage: python3 scripts/check.py [sfDir] [outDir]
Runs DuckDB on oracle_sql.json over sfDir's parquet tables, compares
each result against outDir/<name>/ parquet (column-name-sorted,
row-sorted, value-hash).
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    # stringify with repr-ish fidelity; floats via %.17g
    def cell(v):
        if isinstance(v, float): return "%.17g" % v
        return str(v)
    m = hashlib.sha256()
    for row in df.itertuples(index=False):
        m.update(("|".join(cell(v) for v in row) + "\n").encode())
    return m.hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(pd.concat([pq.read_table(f).to_pandas() for f in files]))
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        exp = canon(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    if h(got) != h(exp):
        diff = (got != exp) & ~(got.isna() & exp.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {name}: hash mismatch ({int(bad.sum())} rows differ)")
        print("  spark:", got[bad].head(3).to_dict("records"))
        print("  duck :", exp[bad].head(3).to_dict("records"))
        fails += 1; continue
    print(f"OK   {name} ({len(got)} rows)")

# rows-only entries (queries without oracle)
for d in sorted(glob.glob(f"{out}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY-FAIL'}")
        if n == 0: fails += 1

print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
