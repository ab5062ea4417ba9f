#!/usr/bin/env python3
"""Generate a scale rung (SURVEY §19.8 / §20): sf0.1 documents/
embeddings replicated Nx with distinct ids, written inside the repo
(target/ is disposable). The *_big gate queries then replicate
embeddings a further 50x internally — at N=10 that's a 1M-row vector
corpus, at N=100 a 10M-row one.

Usage: python3 tools/make_sfrung.py [sf_dir] [out_dir] [factor]
"""
import sys, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sfrung"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT doc_id + c.c * 100000000 AS doc_id, text, lang, source, n_chars
  FROM '{sf}/documents.parquet'
  CROSS JOIN (SELECT unnest(range(0, {factor})) AS c) c
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT vec_id + c.c * 100000000 AS vec_id, embedding, label
  FROM '{sf}/embeddings.parquet'
  CROSS JOIN (SELECT unnest(range(0, {factor})) AS c) c
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
for t in ["documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
