#!/usr/bin/env python3
"""Driver-format oracle compare at an arbitrary scale factor (driver-side
tooling: duckdb + pandas). Usage:

  python3 tools/sf_correctness.py <verify_outdir> <sfdir> <out.json> [q1,q2,...]

Replicates the external driver's CORRECTNESS gate: register the sfdir
parquet tables as DuckDB views, run each oracle SQL from oracle_sql.json,
sort columns by name, hash values, compare to the engine's parquet dump.
"""
import duckdb, json, sys, glob, hashlib
import pandas as pd

outdir, sfdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
only = sys.argv[4].split(',') if len(sys.argv) > 4 else None
con = duckdb.connect()
# Large-SF replays (sf10: ~36 GB RSS for the dump derivation) need an
# explicit spill directory with tens of GB free and a bounded memory pool;
# both default off so the driver-identical small-SF path is unchanged.
import os
def _sq(v):  # SET doesn't take bind parameters; escape quotes for the literal
    return v.replace("'", "''")
if os.environ.get('DUCKDB_TMP'):
    os.makedirs(os.environ['DUCKDB_TMP'], exist_ok=True)
    con.execute(f"SET temp_directory='{_sq(os.environ['DUCKDB_TMP'])}'")
if os.environ.get('DUCKDB_MEMLIMIT'):
    con.execute(f"SET memory_limit='{_sq(os.environ['DUCKDB_MEMLIMIT'])}'")
# DuckDB group-by builds one hash table per thread, so at 32 threads the
# sf10 n-gram/minhash replays multiply their intermediates 32×; capping
# threads trades wall time for fitting the pool. An OOM also poisons the
# connection's buffer pool for every later query — batch runs at large SF
# should run one query per process (the `only` arg exists for this).
if os.environ.get('DUCKDB_THREADS'):
    con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet/*.parquet'")
    except Exception:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        except Exception:
            pass
oracles = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.md5(pd.util.hash_pandas_object(
        df.astype(str), index=False).values.tobytes()).hexdigest()

results = {}
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    entry = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        if not files:
            entry["err"] = "no spark output"
            results[name] = entry
            continue
        o = con.execute(sql).fetchdf()
        s = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        entry["spark_rows"], entry["oracle_rows"] = len(s), len(o)
        entry["rows_match"] = len(s) == len(o)
        entry["schema_match"] = sorted(s.columns) == sorted(o.columns)
        if entry["rows_match"] and entry["schema_match"]:
            # hash compare needs identical row order → sort both frames
            cols = sorted(s.columns)
            s2 = s.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
            o2 = o.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
            entry["hash_match"] = canon(s2) == canon(o2)
    except Exception as e:
        entry["err"] = str(e)[:300]
    results[name] = entry
    print(name, "OK" if entry["hash_match"] else f"FAIL {entry}")

json.dump(results, open(outjson, 'w'), indent=1)
ok = sum(1 for v in results.values() if v["hash_match"])
print(f"{ok}/{len(results)} hash-exact -> {outjson}")
sys.exit(0 if ok == len(results) else 1)
