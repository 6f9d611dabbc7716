"""Device-op anatomy of the fori multi-step tick at the util config
(b32 x 1024, int8 KV) — hunt the non-roofline ops.

Round-4 earlier profile saw: QK 8.06 ms, PV 7.99 ms, w4a16 6.10 ms
(= probe ceiling), a mystery 2.2 ms / 129 GB/s gather, ~1.6 ms misc.
Hypothesis: the 2.2 ms is the bf16 dense lm_head (32000x4096x2 = 262 MB
@ thin-matmul bandwidth ~120 GB/s).  This dumps full op names + shapes.
"""
import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import (calibrate_kv_scales, fuse_stage_linears,
                                       random_packed_llama)
from scripts.bench_fori_decode import decode_loop

B, S, K = 32, 1024, 8
cfg = LlamaConfig(dtype="bfloat16")
model = jax.device_put(fuse_stage_linears(
    random_packed_llama(cfg, group_size=128, seed=0,
                        compute_dtype=cfg.jdtype)))
s8 = calibrate_kv_scales(model, bits=8)
cache = kvc.init_contiguous_cache(32, B, S, cfg.num_key_value_heads,
                                  cfg.head_dim_, dtype=jnp.int8,
                                  k_scales=s8[0], v_scales=s8[1])
tokens = jnp.zeros((B,), jnp.int32)
positions = jnp.full((B,), S - K - 2, jnp.int32)
out, cache = decode_loop(model, tokens, cache, None, positions, K)
np.asarray(out)
with jax.profiler.trace("/tmp/foritrace"):
    out, cache = decode_loop(model, tokens, cache, None, positions, K)
    np.asarray(out)

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
        key = e["name"].split(".")[0]
        tot[key] += e["dur"]
        cnt[key] += 1
        if key not in sample:
            sample[key] = e
print(f"top device ops by total time ({K} steps):", file=sys.stderr)
for name, us in tot.most_common(18):
    e = sample[name]
    args = e.get("args", {})
    extra = str(args.get("long_name", args.get("shape", "")))[:110]
    print(f"  {name[:48]:48s} {us/1e3:8.2f} ms x{cnt[name]:4d} | {extra}",
          file=sys.stderr)
print(f"  TOTAL {sum(tot.values())/1e3:.2f} ms  ({sum(tot.values())/1e3/K:.2f}"
      f" ms/step)", file=sys.stderr)
