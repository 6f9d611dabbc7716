"""Group the fori-tick trace's fusions by output-shape signature."""
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
    if e.get("ph") != "X" or names.get((e["pid"], e["tid"])) != "XLA Ops":
        continue
    if e["name"] == "while.7":
        continue
    ln = e.get("args", {}).get("long_name", e["name"])
    sig = ln.split(" fusion(")[0].split(" = ")[-1][:40] if "=" in ln else e["name"]
    kind = e["name"].split(".")[0]
    key = (kind, sig)
    tot[key] += e["dur"]
    cnt[key] += 1
    if key not in sample:
        sample[key] = ln
print("grouped device ops (8 steps):", file=sys.stderr)
for key, us in tot.most_common(28):
    print(f"  {us/1e3:8.2f} ms x{cnt[key]:5d} {key[0][:18]:18s} | {sample[key][:160]}",
          file=sys.stderr)
