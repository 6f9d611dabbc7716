"""Per-shape w4a16 device times via trace modules (one chain per shape)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
from gptq_v2_tpu.serving.model import random_packed_llama

cfg = LlamaConfig(dtype="bfloat16")
model = jax.device_put(random_packed_llama(cfg, group_size=128, seed=0,
                                           compute_dtype=cfg.jdtype))
B = 128

chains = {}
for name, cdim in (("self_attn.q_proj", 4096), ("mlp.gate_proj", 4096),
                   ("mlp.down_proj", 11008)):
    ps = [lp[name] for lp in model.layers][:10]
    x = jnp.full((B, cdim), 0.01, jnp.bfloat16)

    def chain(x, ps=ps, name=name):
        acc = None
        for p in ps:
            o = w4a16_matmul(x, p)
            acc = o if acc is None else acc + o
        return acc

    f = jax.jit(chain, static_argnames=())
    np.asarray(jax.device_get(f(x).ravel()[:1]))
    chains[name] = (f, x, ps)

with jax.profiler.trace("/tmp/shapetrace"):
    for name, (f, x, ps) in chains.items():
        np.asarray(jax.device_get(f(x).ravel()[:1]))

import gzip, json, glob, collections
fpath = sorted(glob.glob("/tmp/shapetrace/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(fpath) as fh:
    tr = json.load(fh)
names = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e["pid"], e["tid"])] = e["args"]["name"]
mods = sorted((e for e in tr["traceEvents"] if e.get("ph") == "X"
               and names.get((e["pid"], e["tid"])) == "XLA Modules"),
              key=lambda m: m["ts"])
ops = [e for e in tr["traceEvents"] if e.get("ph") == "X"
       and names.get((e["pid"], e["tid"])) == "XLA Ops"
       and e["name"].startswith("_w4a16_2d")]
order = [n for n in chains]
big = [m for m in mods if m["dur"] > 500]
for m, name in zip(big, order):
    sel = [e["dur"] / 1e3 for e in ops if m["ts"] <= e["ts"] <= m["ts"] + m["dur"]]
    p = chains[name][2][0]
    wb = p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes
    per = sum(sel) / len(sel) if sel else 0
    print(f"{name:18s} {p.in_features}->{p.out_features}: module "
          f"{m['dur']/1e3:.2f} ms, kernel {per*1e3:.0f} us/op, "
          f"{wb/(per or 1)/1e9:.0f} GB/s x{len(sel)}", file=sys.stderr)
