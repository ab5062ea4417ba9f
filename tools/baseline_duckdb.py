#!/usr/bin/env python3
"""DuckDB brute-force ANN baseline — the "SQL scan" side of the
reference's SQL-vs-index comparison (/root/reference/plots/vss.png).

Times a top-5 L2 search of 100 query vectors over the embeddings table
(raw, and replicated 50x) as a single set-oriented SQL statement —
DuckDB's best execution of the brute-force shape (vectorized,
multi-threaded), NOT a per-query loop. Emits one JSON line per corpus,
matching tools/AnnBaseline.scala's graft lines.

Usage: python3 tools/baseline_duckdb.py /root/testdata/sf0.1
"""
import sys, time, json
import duckdb

K = 5
REPS = 5

def main(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    con.sql("""CREATE TABLE q AS
        SELECT vec_id AS qid, embedding::FLOAT[] AS qvec
        FROM embeddings WHERE vec_id < 100""")
    nq = con.sql("SELECT count(*) FROM q").fetchone()[0]

    corpora = {
        "raw": """CREATE TABLE corpus AS
            SELECT vec_id AS label, embedding::FLOAT[] AS vec FROM embeddings""",
        "x50": """CREATE TABLE corpus AS
            SELECT e.vec_id + c.c * 1000000 AS label, e.embedding::FLOAT[] AS vec
            FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 50)) AS c) c""",
    }
    # two brute-force spellings: the window-rank scan (the naive SQL a
    # user writes) and the lateral top-k (DuckDB's best shape — a
    # per-query Top-N heap instead of a global sort)
    tiers = {
        "sql_scan_window": f"""
            SELECT qid, label FROM (
              SELECT q.qid, corpus.label,
                row_number() OVER (
                  PARTITION BY q.qid
                  ORDER BY list_distance(q.qvec, corpus.vec), corpus.label) AS rn
              FROM q CROSS JOIN corpus
            ) WHERE rn <= {K}""",
        "sql_scan_lateral": f"""
            SELECT q.qid, n.label
            FROM q, LATERAL (
              SELECT label FROM corpus
              ORDER BY list_distance(q.qvec, corpus.vec), label LIMIT {K}) n""",
    }

    for name, ddl in corpora.items():
        con.sql("DROP TABLE IF EXISTS corpus")
        con.sql(ddl)
        n = con.sql("SELECT count(*) FROM corpus").fetchone()[0]
        for tier, topk in tiers.items():
            con.sql(topk).fetchall()  # warm
            best = float("inf")
            for _ in range(REPS):
                t0 = time.time()
                rows = con.sql(topk).fetchall()
                best = min(best, time.time() - t0)
            assert len(rows) == nq * K
            print(json.dumps({
                "bench": "ann_baseline", "engine": "duckdb_bruteforce",
                "corpus": name, "n": n, "tier": tier, "k": K,
                "n_queries": nq, "batch_sec": best, "qps": nq / best,
                "recall_at_5": 1.0, "replicated_corpus": name != "raw"}))

if __name__ == "__main__":
    main(sys.argv[1])
