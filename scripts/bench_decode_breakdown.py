"""Decode-step component breakdown on the real chip.

Per-op microbenchmarks are useless on a tunneled runtime (each dispatch
costs ~3 ms of round trip — more than the op itself), so each component is
measured as a WHOLE 32-layer program in one dispatch:

* ``linears-only``: all 32 layers' seven W4A16 matmuls, data-chained —
  the packed weight stream in isolation
* ``attention-only``: all 32 layers' contiguous int8-KV write+attend,
  data-chained — the KV stream in isolation
* ``full step``: the production decode step (reference point)

Timing = best sustained window over several rounds, forced readback per
window (same methodology as ``scripts/bench_hbm.py``).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import (calibrate_kv_scales, head_logits,
                                       random_packed_llama)
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MAX_SEQ = 256


def best_window(fn, args, reps=6, rounds=4):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a.ravel()[:1])), out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a.ravel()[:1])), out)
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    cfg = LlamaConfig(dtype="bfloat16")
    nl = cfg.num_hidden_layers
    model = random_packed_llama(cfg, group_size=128, seed=0,
                                compute_dtype=cfg.jdtype)
    model = jax.device_put(model)
    k_scales, v_scales = calibrate_kv_scales(model)
    b = BATCH
    print(f"batch={b}", file=sys.stderr)

    # --- linears-only: 32 layers x 7 chained matmuls -------------------------
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

    x = jnp.full((b, cfg.hidden_size), 0.01, jnp.bfloat16)
    f = jax.jit(linears_only)
    t = best_window(f, (model, x))
    def pl_bytes(p):
        return p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes
    lin_bytes = sum(pl_bytes(p) for lp in model.layers for p in lp.values()
                    if hasattr(p, "qweight"))
    lin_flops = sum(2 * b * p.in_features_padded * p.out_features
                    for lp in model.layers for p in lp.values()
                    if hasattr(p, "qweight"))
    print(f"  linears-only: {t*1e3:7.2f} ms  {lin_bytes/t/1e9:6.1f} GB/s  "
          f"{lin_flops/t/1e12:5.1f} TFLOP/s  ({lin_bytes/1e9:.2f} GB, "
          f"{lin_flops/1e12:.2f} TFLOP)", file=sys.stderr)
    t_lin = t

    # --- attention-only: 32 layers chained write+attend ----------------------
    cache = kvc.init_contiguous_cache(nl, b, MAX_SEQ, cfg.num_key_value_heads,
                                      cfg.head_dim_, dtype=jnp.int8,
                                      k_scales=k_scales, v_scales=v_scales)
    positions = jnp.full((b,), MAX_SEQ - 2, jnp.int32)
    s = MAX_SEQ
    key_mask = jnp.arange(s)[None, :] <= positions[:, None]
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)

    def attention_only(cache, x):
        # x: (b, 1, hq, hd); chains layer to layer through the attn output
        for li in range(nl):
            k = x[:, :, :hkv]
            v = x[:, :, :hkv] * 0.5
            cache = kvc.write_kv_contiguous(cache, li, k, v, positions[:, None])
            k_all, v_all = cache.k[li, :, :s], cache.v[li, :, :s]
            qq = x * jnp.asarray(cache.k_scales[li], jnp.float32).astype(x.dtype)
            attn = L.attention(qq, k_all.astype(x.dtype), v_all.astype(x.dtype),
                               causal_offset=None, key_mask=key_mask,
                               sm_scale=cfg.sm_scale_)
            x = attn * jnp.asarray(cache.v_scales[li], attn.dtype)
        return x, cache

    q0 = jnp.full((b, 1, hq, hd), 0.01, jnp.bfloat16)
    fa = jax.jit(attention_only, donate_argnums=(0,))
    xo, cache = fa(cache, q0)
    np.asarray(jax.device_get(xo.ravel()[:1]))
    ta = float("inf")
    for _ in range(4):
        t0 = time.time()
        for _ in range(6):
            xo, cache = fa(cache, q0)
        np.asarray(jax.device_get(xo.ravel()[:1]))
        ta = min(ta, (time.time() - t0) / 6)
    del cache, xo
    kv_bytes = nl * 2 * b * s * hkv * hd  # int8 reads
    print(f"  attention-only: {ta*1e3:7.2f} ms  {kv_bytes/ta/1e9:6.1f} GB/s "
          f"({kv_bytes/1e9:.2f} GB int8 KV)", file=sys.stderr)

    # --- lm_head (amortized: 8 chained) --------------------------------------
    xh = jnp.full((b, cfg.hidden_size), 0.01, jnp.bfloat16)

    def head8(lm_head, x):
        acc = jnp.zeros((b, cfg.vocab_size), jnp.bfloat16)
        for i in range(8):
            acc = acc + head_logits(cfg, lm_head, x + jnp.bfloat16(i))
        return acc

    fh = jax.jit(head8)
    th = best_window(fh, (model.lm_head, xh)) / 8
    print(f"  lm_head: {th*1e3:7.3f} ms  "
          f"{model.lm_head.nbytes/th/1e9:6.1f} GB/s", file=sys.stderr)

    # --- full step ------------------------------------------------------------
    full_cache = kvc.init_contiguous_cache(nl, b, MAX_SEQ, hkv, hd,
                                           dtype=jnp.int8, k_scales=k_scales,
                                           v_scales=v_scales)
    tokens = jnp.zeros((b,), jnp.int32)
    logits, full_cache = D.decode_step(model, tokens, full_cache, None,
                                       positions)
    np.asarray(logits[:, :8])
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        for _ in range(6):
            logits, full_cache = D.decode_step(model, tokens, full_cache,
                                               None, positions)
        np.asarray(logits[:, :8])
        best = min(best, (time.time() - t0) / 6)
    wbytes = (sum(x.nbytes for x in jax.tree_util.tree_leaves(model.layers))
              + model.lm_head.nbytes + model.norm.nbytes)
    tot = wbytes + kv_bytes
    print(f"  FULL STEP: {best*1e3:7.2f} ms  {tot/best/1e9:6.1f} GB/s eff  "
          f"{b/best:.0f} tok/s", file=sys.stderr)
    comp = t_lin + ta + th
    print(f"  component sum {comp*1e3:.1f} ms vs full {best*1e3:.1f} ms "
          f"(gap {(best-comp)*1e3:+.1f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
