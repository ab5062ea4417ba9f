#!/usr/bin/env python3
"""Independent-implementation replay of text_compressibility (r15
adjudication, VERDICT r14 #9): recompress every document with CPython's
zlib (raw DEFLATE, wbits=-15, the same RFC 1951 stream the engine's
DeflateSize produces via java.util.zip.Deflater(DEFAULT_COMPRESSION,
nowrap=true)) and compare sizes against the graft.Verify output.

This is NOT the driver's DuckDB oracle (DuckDB SQL exposes no
compression functions — see plans/r15/text_compressibility_adjudication.md);
it is the strongest available cross-check: a second, independently
maintained zlib binding reproducing the kernel's per-doc output exactly.

Usage: python3 tools/deflate_crosscheck.py <sf_dir> <verify_out_dir>
Exit 0 iff every non-empty doc's n_deflate matches and n_bytes/ratio_bp
replay exactly.
"""
import glob
import sys
import zlib

import duckdb
import pyarrow.parquet as pq


def main(sf_dir, out_dir):
    files = glob.glob(f"{out_dir}/text_compressibility/*.parquet")
    if not files:
        print("no text_compressibility output under", out_dir, file=sys.stderr)
        return 1
    spark = {r["doc_id"]: r for r in pq.read_table(files[0]).to_pylist()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    n = bad = 0
    for doc_id, text in docs:
        b = text.encode("utf-8")
        if len(b) == 0:
            if doc_id in spark:
                print(f"doc {doc_id}: empty doc should be filtered out")
                bad += 1
            continue
        n += 1
        c = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION, zlib.DEFLATED, -15)
        n_deflate = len(c.compress(b) + c.flush())
        row = spark.get(doc_id)
        if row is None:
            print(f"doc {doc_id}: missing from Spark output")
            bad += 1
            continue
        exp = (len(b), n_deflate, (n_deflate * 10000) // len(b))
        got = (row["n_bytes"], row["n_deflate"], row["ratio_bp"])
        if exp != got:
            print(f"doc {doc_id}: expected {exp} got {got}")
            bad += 1
    extra = set(spark) - {d for d, _ in docs}
    if extra:
        print(f"{len(extra)} rows in Spark output without a source doc")
        bad += 1
    print(f"{n - bad if bad <= n else 0}/{n} docs match "
          f"(CPython zlib {zlib.ZLIB_RUNTIME_VERSION} vs JDK Deflater); "
          f"{bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
