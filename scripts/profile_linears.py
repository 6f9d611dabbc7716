"""Trace linears-only (model) vs a flat chain of the same ops."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
from gptq_v2_tpu.serving.model import random_packed_llama

cfg = LlamaConfig(dtype="bfloat16")
model = random_packed_llama(cfg, group_size=128, seed=0,
                            compute_dtype=cfg.jdtype)
model = jax.device_put(model)
x = jnp.full((128, cfg.hidden_size), 0.01, jnp.bfloat16)


def linears_only(model, x):
    for lp in model.layers:
        h = (w4a16_matmul(x, lp["self_attn.q_proj"])
             + w4a16_matmul(x, lp["self_attn.k_proj"])
             + w4a16_matmul(x, lp["self_attn.v_proj"]))
        h = w4a16_matmul(h, lp["self_attn.o_proj"])
        g = w4a16_matmul(h, lp["mlp.gate_proj"])
        u = w4a16_matmul(h, lp["mlp.up_proj"])
        x = w4a16_matmul(g * u, lp["mlp.down_proj"]) + h
    return x


def qchain(model, x):
    # the same q_proj op repeated across layers (distinct weights), flat
    for lp in model.layers:
        x = w4a16_matmul(x, lp["self_attn.q_proj"])
    return x


f1 = jax.jit(linears_only)
f2 = jax.jit(qchain)
# warm
np.asarray(jax.device_get(f1(model, x).ravel()[:1]))
np.asarray(jax.device_get(f2(model, x).ravel()[:1]))

for name, f in (("linears_only", f1), ("qchain", f2)):
    t0 = time.time()
    for _ in range(6):
        out = f(model, x)
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"{name}: {(time.time()-t0)/6*1e3:.2f} ms/call", file=sys.stderr)

with jax.profiler.trace("/tmp/jaxtrace"):
    out = f1(model, x)
    np.asarray(jax.device_get(out.ravel()[:1]))
    out = f2(model, x)
    np.asarray(jax.device_get(out.ravel()[:1]))
print("trace written", file=sys.stderr)
