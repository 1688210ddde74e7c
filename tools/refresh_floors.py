#!/usr/bin/env python3
"""Refresh PERF_FLOORS.json from one or more bench total-line artifacts.

Policy:
  - default: floor := min(old floor, best quiet-certified measurement)
    (floors only ratchet DOWN — they record the best observed quiet
    seconds, and a loud artifact can only be slower, never faster);
  - --set name=value: explicit override for STRUCTURALLY CHANGED queries
    whose old floor measured a shape that no longer exists (e.g. q344's
    pre-de-skew single-reducer window) — the only legitimate way a floor
    moves UP, and it should be justified in the round's OPTIMIZATION doc;
  - new queries get their best measurement as the initial floor.

Usage: tools/refresh_floors.py BENCH.json [BENCH2.json ...] \
          [--set q344_spearman=2.2 ...] [--dry-run]
Only quiet-certified artifacts are accepted unless --allow-loud.
"""
import json, re, sys

def main(argv):
    benches, sets, dry, allow_loud = [], {}, False, False
    for a in argv:
        if a == "--dry-run": dry = True
        elif a == "--allow-loud": allow_loud = True
        elif a.startswith("--set"):
            pass  # value comes as next token via '='
        elif "=" in a and a.split("=")[0].startswith("q"):
            k, v = a.split("="); sets[k] = float(v)
        else: benches.append(a)
    floors = {}
    order = []
    raw = open("PERF_FLOORS.json").read()
    for m in re.finditer(r'"(q[0-9][^"]*)"\s*:\s*([0-9.eE+-]+)', raw):
        floors[m.group(1)] = float(m.group(2)); order.append(m.group(1))
    best = {}
    for b in benches:
        d = json.load(open(b))
        if not d.get("quiet_certified") and not allow_loud:
            print(f"skip {b}: not quiet-certified"); continue
        for k, v in d["queries"].items():
            if v < 0: continue
            if k not in best or v < best[k]: best[k] = v
    changed, added = 0, 0
    for k, v in best.items():
        if k in sets: continue
        if k not in floors:
            floors[k] = round(v, 3); order.append(k); added += 1
        elif v < floors[k]:
            floors[k] = round(v, 3); changed += 1
    for k, v in sets.items():
        print(f"override {k}: {floors.get(k)} -> {v}")
        if k not in floors: order.append(k)
        floors[k] = v
    order = sorted(set(order))
    print(f"{changed} improved, {added} added, {len(sets)} overridden, "
          f"{len(order)} total")
    if not dry:
        with open("PERF_FLOORS.json", "w") as f:
            f.write("{\n")
            f.write(",\n".join(f'"{k}": {floors[k]}' for k in order))
            f.write("\n}\n")

if __name__ == "__main__":
    main(sys.argv[1:])
