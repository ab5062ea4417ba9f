#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables, compare row sets.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
(Expects graft.Verify to have been run first with the same args.)
"""
import sys, os, json, glob, time
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    costs = {}  # per-oracle DuckDB wall seconds (VERDICT r13 #5: make
    # oracle-suite cost creep visible without a full-suite rerun)
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        spark_tbl = pq.read_table(files[0]) if files else None
        try:
            t0 = time.monotonic()
            duck = con.sql(sql)
            dcols = duck.columns
            drows = duck.fetchall()
            costs[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        scols = spark_tbl.column_names
        # decimal output columns survive some readers as Decimal and others
        # as float64 — the driver's hash canonicalization then mismatches
        # even when values are equal (round-1 lesson: 10 queries failed on
        # exactly this). Emit doubles via Tables.quant4 instead.
        dec = [n for n, t in zip(spark_tbl.schema.names, spark_tbl.schema.types)
               if "decimal" in str(t)]
        if dec:
            results[name] = f"DECIMAL_OUTPUT_HAZARD cols={dec}"
            continue
        srows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        if sorted(scols) != sorted(c.lower() for c in dcols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} duck={sorted(dcols)}"
            continue
        sset, dset = rowset(scols, srows), rowset([c.lower() for c in dcols], drows)
        if len(sset) != len(dset):
            results[name] = f"ROWCOUNT {len(sset)} vs {len(dset)}"
        elif sset == dset:
            results[name] = "OK"
        else:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b]
            results[name] = f"VALUE_MISMATCH {len(diff)}/{len(sset)} rows; first: {diff[0]}"
    # queries with no oracle: rows-only check
    for pdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = pdir.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{pdir}/*.parquet")
            n = pq.read_table(files[0]).num_rows if files else 0
            results[name] = f"ROWS_ONLY n={n}" + ("" if n > 0 else " EMPTY!")
    bad = 0
    for name, r in sorted(results.items()):
        flag = "PASS" if (r == "OK" or r.startswith("ROWS_ONLY n=") and "EMPTY" not in r) else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    if costs:
        cost_file = f"{out_dir}/oracle_costs.json"
        json.dump({"sf_dir": sf_dir, "total_sec": round(sum(costs.values()), 1),
                   "oracles": costs},
                  open(cost_file, "w"), indent=1, sort_keys=True)
        top = sorted(costs.items(), key=lambda kv: -kv[1])[:10]
        print(f"oracle cost: {sum(costs.values()):.1f}s over {len(costs)} oracles "
              f"-> {cost_file}; top: "
              + ", ".join(f"{n}={t:.1f}s" for n, t in top[:3]))
    return bad

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
