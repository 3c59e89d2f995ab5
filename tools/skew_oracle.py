#!/usr/bin/env python3
"""Replay the shipped skew-bench plans' aggregations in DuckDB over the SAME
synthesized hostile inputs and compare frame-exact — "the oracles stay green
on the skewed corpus" (driver-side tooling, like the main verify compare;
the Spark library itself never depends on this).

Usage: python3 tools/skew_oracle.py /tmp/graft_skew
"""
import sys, duckdb
import pandas as pd

work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_skew"
con = duckdb.connect()
fails = []

def compare(name, spark_glob, sql):
    s = con.execute(f"SELECT * FROM '{work}/{spark_glob}/*.parquet'").fetchdf()
    o = con.execute(sql).fetchdf()
    s = s.reindex(sorted(s.columns), axis=1).sort_values(sorted(s.columns)).reset_index(drop=True)
    o = o.reindex(sorted(o.columns), axis=1).sort_values(sorted(o.columns)).reset_index(drop=True)
    ok = s.shape == o.shape and s.astype(str).equals(o.astype(str))
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s)}/{len(o)} rows)")
    if not ok:
        fails.append(name)

compare("dedup_exact_joinback", "out_dedup_exact", f"""
  SELECT doc_id, md5(text) AS text_md5,
         count(*) OVER (PARTITION BY md5(text)) AS n_same_text
  FROM '{work}/docs_skew/*.parquet'""")

compare("graph_stats_salted", "out_graph_stats", f"""
  SELECT pred, obj, count(*) AS n_mentions, count(DISTINCT url) AS n_docs
  FROM '{work}/triples_skew/*.parquet' GROUP BY pred, obj""")

# capped co-occurrence: replicate the per-doc top-64 cap (mention count
# desc, obj tiebreak) exactly
compare("cooccurrence_capped", "out_cooccurrence", f"""
  WITH per_doc AS (
    SELECT url, obj, count(*) AS n FROM '{work}/triples_skew/*.parquet'
    GROUP BY url, obj),
  capped AS (
    SELECT url, obj FROM (
      SELECT url, obj, row_number() OVER (PARTITION BY url ORDER BY n DESC, obj) AS rn
      FROM per_doc) WHERE rn <= 64)
  SELECT a.obj AS obj_a, b.obj AS obj_b, count(*) AS n_docs
  FROM capped a JOIN capped b ON a.url = b.url AND a.obj < b.obj
  GROUP BY a.obj, b.obj""")

print("SKEW ORACLE FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
