#!/usr/bin/env python3
"""Generate the BenchFloors.floors map from one or more bench logs.

Usage: python3 scripts/gen_floors.py <bench.log> [more.log ...]

Parses the full per-query JSON line ({"metric":...,"queries":{...}})
from each log, takes the per-query MIN across boards (the floor is the
best honest reading — a floor inflated by an episode would mask real
regressions), keeps queries with floor >= 0.5s (below that scheduler
jitter alone trips the 3x flag), and prints the Scala map body to
paste into src/main/scala/graft/BenchFloors.scala.
"""
import json
import re
import sys

boards = []
for path in sys.argv[1:]:
    txt = open(path, errors="replace").read()
    best = None
    for m in re.finditer(r'\{"metric".*', txt):
        try:
            d = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            best = d
    if best is None:
        sys.exit(f"no parseable full bench line in {path}")
    boards.append(best["queries"])

names = set().union(*[set(b) for b in boards])
floors = {}
for n in sorted(names):
    vals = [b[n] for b in boards if n in b and b[n] > 0]
    if vals and min(vals) >= 0.5:
        floors[n] = min(vals)

print(f"  // {len(floors)} queries >= 0.5s, min over {len(boards)} board(s)")
print("  val floors: Map[String, Double] = Map(")
items = [f'    "{n}" -> {v:.3f}' for n, v in sorted(floors.items())]
print(",\n".join(items))
print("  )")
