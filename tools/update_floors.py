#!/usr/bin/env python3
"""Re-arm BENCH_FLOOR.json from a bench run (round 11, VERDICT #2/#7).

Reads BENCH_QUERIES.json (written by graft.Bench, carries env_factor),
normalizes every per-query time by the run's env_factor, and folds the
result into BENCH_FLOOR.json:
  - existing query: floor = min(old_floor, t / env_factor)
  - new query (no floor yet): floor = t / env_factor
The floors therefore always express quiet-box-equivalent seconds, and
Bench's regression check compares env-normalized times against them.

Usage: python3 tools/update_floors.py [bench_json] [floor_json] [round]
"""
import json
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_QUERIES.json"
floor_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FLOOR.json"
rnd = sys.argv[3] if len(sys.argv) > 3 else None

bench = json.load(open(bench_path))
env = float(bench.get("env_factor", 1.0))
if not (0.25 <= env <= 10.0):
    print(f"env_factor {env} outside sanity range; refusing", file=sys.stderr)
    sys.exit(1)

floors = json.load(open(floor_path))
q = floors["queries"]
lowered, added = [], []
for name, t in sorted(bench["queries"].items()):
    norm = round(t / env, 3)
    if name not in q:
        q[name] = norm
        added.append((name, norm))
    elif norm < q[name]:
        lowered.append((name, q[name], norm))
        q[name] = norm
if rnd:
    floors["round"] = rnd
floors["env_factor_of_run"] = round(env, 4)
json.dump(floors, open(floor_path, "w"), indent=1, sort_keys=True)
print(f"env_factor={env:.3f}  lowered={len(lowered)}  added={len(added)}")
for name, norm in added:
    print(f"  + {name}: {norm}")
for name, old, new in lowered[:20]:
    print(f"  v {name}: {old} -> {new}")
