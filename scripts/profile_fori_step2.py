"""Finer anatomy: per-fusion breakdown of the fori tick trace already in
/tmp/foritrace (run profile_fori_step.py first)."""
import collections
import glob
import gzip
import json
import sys

fpath = sorted(glob.glob("/tmp/foritrace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(fpath) as fh:
    tr = json.load(fh)
names = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e["pid"], e["tid"])] = e["args"]["name"]
tot = collections.Counter()
cnt = collections.Counter()
sample = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and names.get((e["pid"], e["tid"])) == "XLA Ops":
        key = e["name"]
        tot[key] += e["dur"]
        cnt[key] += 1
        if key not in sample:
            sample[key] = e
print("top individual device ops:", file=sys.stderr)
for name, us in tot.most_common(30):
    e = sample[name]
    args = e.get("args", {})
    extra = str(args.get("long_name", args.get("shape", "")))[:150]
    print(f"  {name[:36]:36s} {us/1e3:8.2f} ms x{cnt[name]:4d} | {extra}",
          file=sys.stderr)
