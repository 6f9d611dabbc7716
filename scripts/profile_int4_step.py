"""Device-op anatomy of one int4-KV decode step (find the slow fusion)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import calibrate_kv_scales, random_packed_llama

B = 128
cfg = LlamaConfig(dtype="bfloat16")
model = jax.device_put(random_packed_llama(cfg, group_size=128, seed=0,
                                           compute_dtype=cfg.jdtype))
s4 = calibrate_kv_scales(model, bits=4)
cache = kvc.init_contiguous_cache(32, B, 256, cfg.num_key_value_heads,
                                  cfg.head_dim_, dtype=jnp.int8,
                                  k_scales=s4[0], v_scales=s4[1], kv_bits=4)
tokens = jnp.zeros((B,), jnp.int32)
positions = jnp.full((B,), 128, jnp.int32)
logits, cache = D.decode_step(model, tokens, cache, None, positions)
np.asarray(logits[:, :8])
with jax.profiler.trace("/tmp/int4trace"):
    logits, cache = D.decode_step(model, tokens, cache, None, positions)
    np.asarray(logits[:, :8])

import collections
import glob
import gzip
import json

fpath = sorted(glob.glob("/tmp/int4trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(fpath) as fh:
    tr = json.load(fh)
names = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e["pid"], e["tid"])] = e["args"]["name"]
tot = collections.Counter()
cnt = collections.Counter()
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and names.get((e["pid"], e["tid"])) == "XLA Ops":
        key = e["name"].split(".")[0]
        tot[key] += e["dur"]
        cnt[key] += 1
print("top device ops by total time:", file=sys.stderr)
for name, us in tot.most_common(14):
    print(f"  {name[:60]:60s} {us/1e3:9.2f} ms x{cnt[name]}", file=sys.stderr)
print(f"  TOTAL {sum(tot.values())/1e3:.2f} ms", file=sys.stderr)
