#!/usr/bin/env python3
"""SIMD-on vs scalar suite comparison (VERDICT r11 #2).

Compares two graft.Verify output dirs (same SF, one run scalar, one with
-Dgraft.simd.enabled=true) and classifies every query:

  bit_equal         identical row sets (the expected outcome for queries
                    whose plan never touches a gated kernel, and for
                    gated kernels on lane-pure data)
  membership_equal  (qid, label) sets identical per query row-group but
                    rank/distance cells differ -- the declared SIMD
                    contract: lane-reassociated sums may flip genuine
                    distance ties / last-decimal roundings, top-k
                    MEMBERSHIP must hold
  rowcount_equal    same cardinality only (pre-aggregated outputs whose
                    value cells moved by the ~1e-15 sum drift)
  DIFFERS           anything else -- a real divergence, investigate

Usage: python3 tools/simd_ab.py /tmp/verify_scalar /tmp/verify_simd
"""
import sys, glob, json, math
import pyarrow.parquet as pq


def load(pdir):
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        return None
    t = pq.read_table(files[0])
    return t


def canon_rows(t):
    cols = sorted(t.column_names)
    rows = [tuple(r[c] for c in cols) for r in t.to_pylist()]
    return cols, sorted(map(repr, rows))


def membership(t):
    """per-qid label multiset for knn-shaped outputs"""
    names = t.column_names
    if "label" not in names:
        return None
    key = "qid" if "qid" in names else ("tier" if "tier" in names else None)
    groups = {}
    for r in t.to_pylist():
        groups.setdefault(r.get(key) if key else 0, []).append(r["label"])
    return {k: sorted(map(repr, v)) for k, v in groups.items()}


def close_values(ta, tb, rel=1e-9):
    """same shape, numeric cells within rel tolerance (sum-drift check)"""
    if sorted(ta.column_names) != sorted(tb.column_names):
        return False
    cols = sorted(ta.column_names)
    ra = sorted(ta.to_pylist(), key=lambda r: [repr(r[c]) for c in cols])
    rb = sorted(tb.to_pylist(), key=lambda r: [repr(r[c]) for c in cols])
    if len(ra) != len(rb):
        return False
    for a, b in zip(ra, rb):
        for c in cols:
            va, vb = a[c], b[c]
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb and not math.isclose(va, vb, rel_tol=rel, abs_tol=1e-12):
                    return False
            elif va != vb:
                return False
    return True


def main(scalar_dir, simd_dir):
    names = sorted(
        p.rstrip("/").split("/")[-1] for p in glob.glob(f"{scalar_dir}/*/"))
    out, bad = {}, 0
    for name in names:
        ta, tb = load(f"{scalar_dir}/{name}"), load(f"{simd_dir}/{name}")
        if ta is None or tb is None:
            out[name] = "MISSING"
            bad += 1
            continue
        ca, cb = canon_rows(ta), canon_rows(tb)
        if ca == cb:
            out[name] = "bit_equal"
            continue
        ma, mb = membership(ta), membership(tb)
        if ma is not None and ma == mb:
            out[name] = "membership_equal"
            continue
        if ta.num_rows == tb.num_rows and close_values(ta, tb):
            out[name] = "rowcount_equal"  # values within 1e-9 rel (sum drift)
            continue
        out[name] = "DIFFERS"
        bad += 1
    counts = {}
    for v in out.values():
        counts[v] = counts.get(v, 0) + 1
    for name, v in sorted(out.items()):
        if v != "bit_equal":
            print(f"{v:17} {name}")
    print(json.dumps({"counts": counts, "queries": len(out), "bad": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
