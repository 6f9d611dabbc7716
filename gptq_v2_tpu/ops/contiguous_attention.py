"""Fused decode attention over the contiguous KV cache.

One Pallas kernel per layer replaces the XLA einsum chain (scores →
softmax → PV) of the contiguous decode path: K and V stream from HBM
exactly once per step, int8 dequantization folds into the score/PV math
(the k-scale is folded into q by the caller, the v-scale applied to the
output), and the softmax intermediates never leave VMEM.  The XLA path
materializes the f32 score tensor between two passes and runs the convert
as part of two separate fusions; fusing them buys the last ~20% toward the
HBM roofline on the dominant KV stream.

Variant support is in-kernel and mask-based, so the newest families ride
the kernel path too (they previously fell to the dense einsum,
``docs/STATUS.md`` round-1 gaps):

* sliding windows (Mistral/Gemma) — ``j > pos - window``
* chunked attention (Llama-4) — ``j // chunk == pos // chunk``
* logit soft-capping (Gemma-2) — ``cap · tanh(s / cap)``
* attention sinks (GPT-OSS) — ``exp(sink - m)`` joins the denominator

GQA runs natively: q is regrouped ``(B, G, Hkv, hd)`` (one ``(Hb, hd)``
slab per group index) so scores batch over kv heads without relayouts.

jnp twin: :func:`contiguous_decode_attention_ref` (also the non-TPU path).
Semantics mirror ``models.llama.attention`` with ``causal_offset=None`` +
``key_mask`` from positions (reference has no serving attention at all —
its eval is dense fp16 matmuls, reference ``quant.py:262-279``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, sink_ref, q_ref, k_ref, v_ref, o_ref, *,
            s_total, groups, hb, sm_scale, window, chunk, soft_cap,
            has_sinks, compute_dt, kv_bits=8):
    b = pl.program_id(0)
    pos = pos_ref[b]
    k8 = k_ref[0, 0]  # (S, Hb, hd) cache dtype — (S, Hb, hd/2) int4-packed
    v8 = v_ref[0, 0]
    int4 = kv_bits == 4
    if int4:
        # nibble-packed (kv_cache.pack_int4_rows): byte i = head-dim i
        # (low nibble) | i + hd/2 (high).  Sign-extend both halves; the
        # score needs no interleave (q splits into halves below) and the
        # PV output is the natural lo/hi concat.
        kw = k8.astype(jnp.int32)
        k_lo = ((kw << 28) >> 28).astype(compute_dt)  # (S, Hb, hd/2)
        k_hi = ((kw << 24) >> 28).astype(compute_dt)
        vw = v8.astype(jnp.int32)
        v_lo = ((vw << 28) >> 28).astype(compute_dt)
        v_hi = ((vw << 24) >> 28).astype(compute_dt)
    else:
        kf = k8.astype(compute_dt)
    neg = jnp.finfo(jnp.float32).min
    sj = jax.lax.broadcasted_iota(jnp.int32, (s_total, hb), 0)
    valid = sj <= pos
    if window is not None:
        valid &= sj > pos - window
    if chunk is not None:
        valid &= (sj // chunk) == (pos // chunk)
    for g in range(groups):
        qg = q_ref[0, g]  # (Hb, hd)
        if int4:
            hd2 = k8.shape[2]
            # NB: basic slice THEN expand — ``qg[None, :, :hd2]`` (newaxis
            # mixed with slices) lowers to a gather Mosaic rejects
            q_lo = qg[:, :hd2].astype(compute_dt)[None]
            q_hi = qg[:, hd2:].astype(compute_dt)[None]
            scores = (jnp.sum(k_lo * q_lo, axis=2)
                      + jnp.sum(k_hi * q_hi, axis=2)).astype(jnp.float32)
        else:
            scores = jnp.sum(kf * qg[None].astype(compute_dt),
                             axis=2).astype(jnp.float32)  # (S, Hb)
        scores = scores * sm_scale
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        scores = jnp.where(valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)  # (1, Hb)
        if has_sinks:
            sk = sink_ref[g][None]  # (1, Hb) f32 (hb == hkv when sinks)
            m = jnp.maximum(m, sk)
        p = jnp.exp(scores - m)  # (S, Hb)
        l = jnp.sum(p, axis=0, keepdims=True)
        if has_sinks:
            l = l + jnp.exp(sk - m)
        pc = p[:, :, None].astype(compute_dt)
        if int4:
            ctx = jnp.concatenate(
                [jnp.sum(pc * v_lo, axis=0), jnp.sum(pc * v_hi, axis=0)],
                axis=-1)  # (Hb, hd)
        else:
            ctx = jnp.sum(pc * v8.astype(compute_dt), axis=0)  # (Hb, hd)
        o_ref[0, g] = (ctx.astype(jnp.float32)
                       / l[0][:, None]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("layer", "sm_scale", "window", "chunk", "soft_cap",
                     "hb", "interpret", "s_used", "kv_bits"))
def _call(q_g, k_cache, v_cache, positions, sinks_g, layer: int,
          sm_scale: float, window, chunk, soft_cap, hb: int,
          interpret: bool, s_used: int = None, kv_bits: int = 8):
    b, groups, hkv, hd = q_g.shape
    hd_st = k_cache.shape[4]  # hd/2 when int4-packed
    # the cache block covers only the first s_used rows — no slicing of the
    # cache array (a jnp slice would materialize a copy of the whole layer)
    s_total = k_cache.shape[2] if s_used is None else s_used
    has_sinks = sinks_g is not None
    if sinks_g is None:  # dummy operand keeps one kernel arity
        sinks_g = jnp.zeros((1, 1), jnp.float32)
    kernel = functools.partial(
        _kernel, s_total=s_total, groups=groups, hb=hb,
        sm_scale=sm_scale, window=window, chunk=chunk, soft_cap=soft_cap,
        has_sinks=has_sinks, compute_dt=q_g.dtype, kv_bits=kv_bits)
    grid = (b, hkv // hb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # positions (B,)
            pl.BlockSpec(sinks_g.shape, lambda bi, hi: (0, 0)),  # sinks
            pl.BlockSpec((1, groups, hb, hd), lambda bi, hi: (bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd_st),
                         lambda bi, hi, layer=layer: (layer, bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd_st),
                         lambda bi, hi, layer=layer: (layer, bi, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((1, groups, hb, hd),
                               lambda bi, hi: (bi, 0, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, groups, hkv, hd), q_g.dtype),
        interpret=interpret,
    )(positions, sinks_g, q_g, k_cache, v_cache)
    return out


def contiguous_decode_attention(
    q: jax.Array,  # (B, Hq, hd) — k-scale/q-scale already folded in
    k_cache: jax.Array,  # (L, B, S, Hkv, hd) int8 or compute dtype
    v_cache: jax.Array,  # (L, B, S, Hkv, hd)
    positions: jax.Array,  # (B,) int32 — position of the current token
    layer: int,
    s_bucket: Optional[int] = None,
    sm_scale: float = 1.0,
    window: Optional[int] = None,
    chunk: Optional[int] = None,
    soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # (Hq,) f32 learned sink logits
    interpret: Optional[bool] = None,
    kv_bits: int = 8,
) -> jax.Array:
    """Single-token decode attention for every slot; returns (B, Hq, hd).

    ``s_bucket`` statically bounds the attended prefix (all positions must
    be < s_bucket) — the cache block read from HBM covers only the first
    ``s_bucket`` rows.  ``kv_bits=4``: caches are nibble-packed int8 with
    last dim ``hd/2`` (``kv_cache.pack_int4_rows``), dequantized in-kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, hd = q.shape
    hkv = k_cache.shape[3]
    groups = hq // hkv
    s = k_cache.shape[2] if s_bucket is None else min(s_bucket,
                                                      k_cache.shape[2])
    # kv-head block: whole-Hkv blocks up to a 2MB cache block budget;
    # sinks need the whole head row resident (hb == hkv)
    hb = hkv
    if sinks is None:
        while hb > 8 and (s * hb * k_cache.shape[4]
                          * k_cache.dtype.itemsize) > 2 << 20:
            hb //= 2
        while hkv % hb:
            hb //= 2
        hb = max(hb, 1)
    # group-major regroup: q (B, Hq, hd) -> (B, G, Hkv, hd) so the kernel
    # reads one (Hb, hd) slab per group index (HF head order is kv-major)
    q_g = q.reshape(b, hkv, groups, hd).swapaxes(1, 2)
    sinks_g = None
    if sinks is not None:
        sinks_g = jnp.asarray(sinks, jnp.float32).reshape(hkv, groups).T
    out = _call(q_g, k_cache, v_cache, positions.astype(jnp.int32), sinks_g,
                layer=layer, sm_scale=float(sm_scale), window=window,
                chunk=chunk, soft_cap=soft_cap, hb=hb,
                interpret=bool(interpret), s_used=s,
                kv_bits=4 if kv_bits == 4 else 8)
    return out.swapaxes(1, 2).reshape(b, hq, hd)


def contiguous_decode_attention_ref(q, k_cache, v_cache, positions, layer,
                                    s_bucket=None, sm_scale=1.0, window=None,
                                    chunk=None, soft_cap=None, sinks=None,
                                    kv_bits=8):
    """jnp twin (identical signature minus ``interpret``)."""
    b, hq, hd = q.shape
    s = k_cache.shape[2] if s_bucket is None else min(s_bucket,
                                                      k_cache.shape[2])
    if kv_bits == 4:
        from gptq_v2_tpu.serving.kv_cache import unpack_int4_rows

        k = unpack_int4_rows(k_cache[layer, :, :s]).astype(q.dtype)
        v = unpack_int4_rows(v_cache[layer, :, :s]).astype(q.dtype)
    else:
        k = k_cache[layer, :, :s].astype(q.dtype)
        v = v_cache[layer, :, :s].astype(q.dtype)
    from gptq_v2_tpu.models import llama as L

    mask = jnp.arange(s)[None, :] <= positions[:, None]
    if window is not None:
        mask &= jnp.arange(s)[None, :] > positions[:, None] - window
    if chunk is not None:
        mask &= (jnp.arange(s)[None, :] // chunk) == (positions[:, None] // chunk)
    out = L.attention(q[:, None], k, v, causal_offset=None, key_mask=mask,
                      sm_scale=sm_scale, logit_cap=soft_cap, sinks=sinks)
    return out[:, 0]
