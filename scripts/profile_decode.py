"""Device-time vs wall-time anatomy of the decode step + multi-step burst."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import calibrate_kv_scales, random_packed_llama

B = 128
MAX_SEQ = 256

cfg = LlamaConfig(dtype="bfloat16")
model = jax.device_put(random_packed_llama(cfg, group_size=128, seed=0,
                                           compute_dtype=cfg.jdtype))
k_scales, v_scales = calibrate_kv_scales(model)
cache = kvc.init_contiguous_cache(cfg.num_hidden_layers, B, MAX_SEQ,
                                  cfg.num_key_value_heads, cfg.head_dim_,
                                  dtype=jnp.int8, k_scales=k_scales,
                                  v_scales=v_scales)
tokens = jnp.zeros((B,), jnp.int32)
positions = jnp.full((B,), 128, jnp.int32)
temps = jnp.zeros((B,), jnp.float32)
key = jax.random.key(0)

# single steps
logits, cache = D.decode_step(model, tokens, cache, None, positions)
np.asarray(logits[:, :8])
t0 = time.time()
for i in range(10):
    logits, cache = D.decode_step(model, tokens, cache, None, positions)
np.asarray(logits[:, :8])
t_step = (time.time() - t0) / 10
print(f"single-step wall: {t_step*1e3:.2f} ms -> {B/t_step:.0f} tok/s",
      file=sys.stderr)

# multi-step burst (unrolled, donated)
K = 8
out, cache, key = D.decode_sample_multi(model, tokens, cache, None, positions,
                                        temps, key, K)
np.asarray(out[-1, :8])
t0 = time.time()
for i in range(3):
    out, cache, key = D.decode_sample_multi(model, tokens, cache, None,
                                            positions, temps, key, K)
np.asarray(out[-1, :8])
t_multi = (time.time() - t0) / 3 / K
print(f"multi-step({K}) wall: {t_multi*1e3:.2f} ms/tok -> {B/t_multi:.0f} tok/s",
      file=sys.stderr)

with jax.profiler.trace("/tmp/decodetrace"):
    logits, cache = D.decode_step(model, tokens, cache, None, positions)
    np.asarray(logits[:, :8])
    out, cache, key = D.decode_sample_multi(model, tokens, cache, None,
                                            positions, temps, key, K)
    np.asarray(out[-1, :8])
print("trace written", file=sys.stderr)
