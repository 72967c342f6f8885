import duckdb, json, glob, sys, os
import pyarrow.parquet as pq
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); continue
    # driver-style: sort columns by name, then compare value hashes
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f'{name}: SCHEMA MISMATCH {list(got.columns)} vs {list(want.columns)}'); continue
    if len(got) != len(want):
        print(f'{name}: ROWCOUNT {len(got)} vs {len(want)}'); continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    same = True
    for c in got.columns:
        gv, wv = g[c], w[c]
        if not (gv.astype(str).values == wv.astype(str).values).all():
            bad = (gv.astype(str).values != wv.astype(str).values)
            i = bad.argmax()
            print(f'{name}: VALUE MISMATCH col={c} row={i}: {gv.iloc[i]!r} vs {wv.iloc[i]!r}')
            same = False; break
    if same: print(f'{name}: OK ({len(got)} rows)')

# Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]
# Mirrors the driver's correctness gate locally: run graft.Verify first,
# then this script replays every oracle_sql.json entry in DuckDB and
# compares (columns sorted by name, rows sorted, stringified values).
