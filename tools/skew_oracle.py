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

# round 5: corpus-wide paragraph dedup over the hostile docs (deterministic
# 8-word-line / 3-line-paragraph structure, as the engine's Gopher.structure)
compare("paragraph_dedup_salted", "out_para_dedup", f"""
  WITH docw AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM '{work}/docs_skew/*.parquet'),
  st1 AS (SELECT doc_id,
            [array_to_string(w[8*i+1 : 8*i+8], ' ')
             for i in generate_series(0, CAST(ceil(len(w)/8.0) AS INT)-1)] AS lines
          FROM docw),
  st2 AS (SELECT doc_id,
            [array_to_string(lines[3*j+1 : 3*j+3], chr(10))
             for j in generate_series(0, CAST(ceil(len(lines)/3.0) AS INT)-1)] AS paras
          FROM st1),
  parau AS (SELECT doc_id, unnest(paras) AS p FROM st2),
  ph AS (SELECT doc_id, md5(p) AS h FROM parau),
  cnt AS (SELECT h, count(*) AS n FROM ph GROUP BY h),
  perdoc AS (SELECT doc_id, count(*) AS n_paras,
                    sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS n_dup
             FROM ph JOIN cnt c USING (h) GROUP BY doc_id)
  SELECT doc_id, CAST(n_paras AS BIGINT) AS n_paras,
         CAST(n_dup AS BIGINT) AS n_dup_paras,
         CAST(n_dup AS DOUBLE)/CAST(n_paras AS DOUBLE) AS dup_para_frac,
         CAST(n_dup AS DOUBLE)/CAST(n_paras AS DOUBLE) <= 0.3 AS para_dedup_keep
  FROM perdoc""")

# round 6: corpus×corpus bucketed acceptance — replay the interval join +
# per-class P/R over the synthesized span sets (the bucketed rewrite is an
# execution strategy; semantics replay as the plain theta join)
compare("acceptance_bucketed_corpus", "out_acceptance", f"""
  WITH pred AS (SELECT DISTINCT * FROM '{work}/spans_pred/*.parquet'),
  gold AS (SELECT DISTINCT * FROM '{work}/spans_gold/*.parquet'),
  ov AS (
    SELECT p.url, p.start, p."end", p.entity_class,
           g.start AS g_start, g."end" AS g_end
    FROM pred p JOIN gold g
      ON p.url = g.url AND p.entity_class = g.entity_class
     AND g.start < p."end" AND p.start < g."end"),
  tpc AS (SELECT entity_class, count(*) AS tp FROM (
    SELECT DISTINCT url, g_start, g_end, entity_class FROM ov) GROUP BY entity_class),
  fpc AS (SELECT entity_class, count(*) AS fp FROM (
    SELECT url, start, "end", entity_class FROM pred
    EXCEPT SELECT DISTINCT url, start, "end", entity_class FROM ov) GROUP BY entity_class),
  fnc AS (SELECT entity_class, count(*) AS fn FROM (
    SELECT url, start, "end", entity_class FROM gold
    EXCEPT SELECT DISTINCT url, g_start, g_end, entity_class FROM ov) GROUP BY entity_class),
  cls AS (SELECT DISTINCT entity_class FROM (
    SELECT entity_class FROM pred UNION SELECT entity_class FROM gold))
  SELECT entity_class, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         CAST(fn AS BIGINT) AS fn,
         CASE WHEN tp + fp = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE)/CAST(tp + fp AS DOUBLE) END AS "precision",
         CASE WHEN tp + fn = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE)/CAST(tp + fn AS DOUBLE) END AS recall
  FROM (SELECT c.entity_class, coalesce(t.tp, 0) AS tp, coalesce(f.fp, 0) AS fp,
               coalesce(n.fn, 0) AS fn
        FROM cls c LEFT JOIN tpc t USING (entity_class)
        LEFT JOIN fpc f USING (entity_class) LEFT JOIN fnc n USING (entity_class))""")

# round 5: substring-anchor dedup — reuse the COMMITTED oracle derivation
# (the same SQL the driver gate runs) with `documents` viewed over the
# hostile corpus
import json, os
osql_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
if os.path.exists(osql_path):
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{work}/docs_skew/*.parquet'")
    osql = json.load(open(osql_path))
    compare("substring_anchor_blacklist", "out_substring",
            osql["dedup_substring"].replace("ORDER BY doc_a, doc_b", ""))
    # round 7: span-level ExactSubstr — same committed-oracle replay over
    # the hostile corpus (periodic template → a handful of mega-keys each
    # carried by every template copy)
    if "dedup_substring_spans" in osql:
        compare("substring_spans_mega_key", "out_substring_spans",
                osql["dedup_substring_spans"])
    else:
        print("substring_spans_mega_key: SKIP (oracle_sql.json predates the query)")
        fails.append("substring_spans_mega_key(stale oracle_sql.json)")
else:
    print(f"substring_anchor_blacklist: SKIP (no {osql_path}; run graft.Verify first)")
    fails.append("substring_anchor_blacklist(no oracle_sql.json)")

# round 7: C4 three-sentence dedup over the sentence-structured hostile
# variant (the banner window on EVERY doc; canonical = min (doc_id, pos)).
# Independent relational re-derivation, same shape as the committed oracle
# but over the bench's own concat-derived corpus.
compare("c4_spans_mega_key", "out_c4_spans", f"""
  WITH docs AS (
    SELECT doc_id,
           'shared banner sentence one. shared banner sentence two. ' ||
           'shared banner sentence three. ' || text || ' unique tail ' ||
           doc_id || ' closes this page.' AS text
    FROM '{work}/docs_skew/*.parquet'),
  sent AS (SELECT doc_id,
             string_split(regexp_replace(replace(text, chr(10), ' '),
               '([.!?]) ', '\\1' || chr(1), 'g'), chr(1)) AS s
           FROM docs),
  occ AS (SELECT doc_id,
            unnest(generate_series(1, len(s) - 2)) AS i,
            unnest([array_to_string(s[i : i + 2], ' ')
                    for i in generate_series(1, len(s) - 2)]) AS w
          FROM sent WHERE len(s) >= 3),
  rk AS (SELECT doc_id, i, w,
           count(*) OVER (PARTITION BY w) AS n,
           row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn
         FROM occ),
  rem AS (SELECT DISTINCT doc_id, i + k.range AS p
          FROM rk, range(3) k WHERE n >= 2 AND rn > 1),
  perdoc AS (SELECT doc_id, count(*) AS n_windows,
               sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS n_dup
             FROM rk GROUP BY doc_id),
  remc AS (SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY doc_id),
  su AS (SELECT doc_id, unnest(generate_series(1, len(s))) AS j,
                unnest(s) AS sentence FROM sent),
  cleans AS (
    SELECT su.doc_id, string_agg(su.sentence, ' ' ORDER BY su.j) AS c
    FROM su LEFT JOIN rem ON su.doc_id = rem.doc_id AND su.j = rem.p
    WHERE rem.p IS NULL GROUP BY su.doc_id)
  SELECT d.doc_id,
         CAST(len(sent.s) AS BIGINT) AS n_sentences,
         CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
         CAST(coalesce(pd.n_dup, 0) AS BIGINT) AS n_dup_windows,
         CAST(coalesce(rc.n_removed, 0) AS BIGINT) AS n_removed_sentences,
         md5(coalesce(cl.c, '')) AS clean_md5
  FROM docs d
  JOIN sent USING (doc_id)
  LEFT JOIN perdoc pd USING (doc_id)
  LEFT JOIN remc rc USING (doc_id)
  LEFT JOIN cleans cl USING (doc_id)""")

print("SKEW ORACLE FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
