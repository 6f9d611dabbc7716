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


def _kernel(layer_ref, pos_ref, sink_ref, q_ref, k_ref, v_ref, o_ref, *,
            s_total, groups, hb, sm_scale, window, chunk, soft_cap,
            has_sinks, compute_dt):
    del layer_ref  # consumed by the cache index maps only
    b = pl.program_id(0)
    pos = pos_ref[b]
    k8 = k_ref[0, 0]  # (S, Hb, hd) cache dtype
    v8 = v_ref[0, 0]
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
        ctx = jnp.sum(pc * v8.astype(compute_dt), axis=0)  # (Hb, hd)
        o_ref[0, g] = (ctx.astype(jnp.float32)
                       / l[0][:, None]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "chunk", "soft_cap",
                     "hb", "interpret", "s_used"))
def _call(q_g, k_cache, v_cache, positions, sinks_g, layer,
          sm_scale: float, window, chunk, soft_cap, hb: int,
          interpret: bool, s_used: int = None):
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
        has_sinks=has_sinks, compute_dt=q_g.dtype)
    grid = (b, hkv // hb)
    # the layer index rides scalar prefetch (cache index maps read it), so
    # every layer of the unrolled decode shares ONE kernel binary — 32
    # static-layer instances both compile ~32x slower and overload the
    # remote-compile helper at 7B scale (observed hard crash)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer (1,), positions (B,)
        grid=grid,
        in_specs=[
            pl.BlockSpec(sinks_g.shape, lambda bi, hi, li, po: (0, 0)),
            pl.BlockSpec((1, groups, hb, hd),
                         lambda bi, hi, li, po: (bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd_st),
                         lambda bi, hi, li, po: (li[0], bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd_st),
                         lambda bi, hi, li, po: (li[0], bi, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((1, groups, hb, hd),
                               lambda bi, hi, li, po: (bi, 0, hi, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, groups, hkv, hd), q_g.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), positions, sinks_g, q_g,
      k_cache, v_cache)
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
) -> jax.Array:
    """Single-token decode attention for every slot; returns (B, Hq, hd).

    ``s_bucket`` statically bounds the attended prefix (all positions must
    be < s_bucket) — the cache block read from HBM covers only the first
    ``s_bucket`` rows.
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
                interpret=bool(interpret), s_used=s)
    return out.swapaxes(1, 2).reshape(b, hq, hd)


def _kernel_p4(layer_ref, pos_ref, sink_ref, q_lo_ref, q_hi_ref, k_ref,
               v_ref, o_lo_ref, o_hi_ref, *, s_total, groups, hb, sm_scale,
               window, chunk, soft_cap, has_sinks, compute_dt):
    """Single-read int4 decode attention: each streamed byte of the
    head-pair-packed cache (``kv_cache.pack_int4_rows``) carries kv-head
    ``p`` (low nibble) and ``p + Hkv/2`` (high nibble); both heads'
    score/softmax/PV run on the one resident block, so the packed tensor
    streams from HBM ONCE — half the physical traffic of the two-pass XLA
    unpack path, which re-reads it per nibble half."""
    del layer_ref
    b = pl.program_id(0)
    pos = pos_ref[b]
    # int8 vector shifts don't legalize in this Mosaic backend — widen to
    # i32 first; the high nibble is then ONE arithmetic shift (the int8→i32
    # convert preserved the byte's sign), the low needs the shl/shr pair
    kw = k_ref[0, 0].astype(jnp.int32)  # (S, Hb_p, hd) nibble-packed
    vw = v_ref[0, 0].astype(jnp.int32)
    k_lo = ((kw << 28) >> 28).astype(compute_dt)
    k_hi = (kw >> 4).astype(compute_dt)
    neg = jnp.finfo(jnp.float32).min
    sj = jax.lax.broadcasted_iota(jnp.int32, (s_total, hb), 0)
    valid = sj <= pos
    if window is not None:
        valid &= sj > pos - window
    if chunk is not None:
        valid &= (sj // chunk) == (pos // chunk)

    def halve(q_ref, kf, v8h, o_ref, sink_half):
        for g in range(groups):
            qg = q_ref[0, g]  # (Hb_p, hd)
            scores = jnp.sum(kf * qg[None].astype(compute_dt),
                             axis=2).astype(jnp.float32)  # (S, Hb_p)
            scores = scores * sm_scale
            if soft_cap is not None:
                scores = soft_cap * jnp.tanh(scores / soft_cap)
            scores = jnp.where(valid, scores, neg)
            m = jnp.max(scores, axis=0, keepdims=True)
            if has_sinks:
                sk = sink_half[g][None]
                m = jnp.maximum(m, sk)
            p = jnp.exp(scores - m)
            l = jnp.sum(p, axis=0, keepdims=True)
            if has_sinks:
                l = l + jnp.exp(sk - m)
            pc = p[:, :, None].astype(compute_dt)
            ctx = jnp.sum(pc * v8h, axis=0)  # (Hb_p, hd)
            o_ref[0, g] = (ctx.astype(jnp.float32)
                           / l[0][:, None]).astype(o_ref.dtype)

    sk_lo = sink_ref[:, :hb] if has_sinks else None
    sk_hi = sink_ref[:, hb:] if has_sinks else None
    halve(q_lo_ref, k_lo, ((vw << 28) >> 28).astype(compute_dt), o_lo_ref,
          sk_lo)
    halve(q_hi_ref, k_hi, (vw >> 4).astype(compute_dt), o_hi_ref, sk_hi)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "window", "chunk", "soft_cap",
                     "hb", "interpret", "s_used"))
def _call_p4(q_lo, q_hi, k_cache, v_cache, positions, sinks_g, layer,
             sm_scale: float, window, chunk, soft_cap, hb: int,
             interpret: bool, s_used: int = None):
    b, groups, hp, hd = q_lo.shape
    s_total = k_cache.shape[2] if s_used is None else s_used
    has_sinks = sinks_g is not None
    if sinks_g is None:
        sinks_g = jnp.zeros((1, 2), jnp.float32)
    kernel = functools.partial(
        _kernel_p4, s_total=s_total, groups=groups, hb=hb,
        sm_scale=sm_scale, window=window, chunk=chunk, soft_cap=soft_cap,
        has_sinks=has_sinks, compute_dt=q_lo.dtype)
    grid = (b, hp // hb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer (1,), positions (B,)
        grid=grid,
        in_specs=[
            pl.BlockSpec(sinks_g.shape, lambda bi, hi, li, po: (0, 0)),
            pl.BlockSpec((1, groups, hb, hd),
                         lambda bi, hi, li, po: (bi, 0, hi, 0)),
            pl.BlockSpec((1, groups, hb, hd),
                         lambda bi, hi, li, po: (bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd),
                         lambda bi, hi, li, po: (li[0], bi, 0, hi, 0)),
            pl.BlockSpec((1, 1, s_total, hb, hd),
                         lambda bi, hi, li, po: (li[0], bi, 0, hi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, groups, hb, hd),
                         lambda bi, hi, li, po: (bi, 0, hi, 0)),
            pl.BlockSpec((1, groups, hb, hd),
                         lambda bi, hi, li, po: (bi, 0, hi, 0)),
        ),
    )
    o_lo, o_hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, groups, hp, hd), q_lo.dtype),
                   jax.ShapeDtypeStruct((b, groups, hp, hd), q_lo.dtype)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), positions, sinks_g, q_lo,
      q_hi, k_cache, v_cache)
    return o_lo, o_hi


def contiguous_decode_attention_p4(
    q: jax.Array,  # (B, Hq, hd) — k-scale/q-scale already folded in
    k_cache: jax.Array,  # (L, B, S, Hkv/2, hd) nibble-packed int8
    v_cache: jax.Array,
    positions: jax.Array,  # (B,)
    layer: int,
    s_bucket: Optional[int] = None,
    sm_scale: float = 1.0,
    window: Optional[int] = None,
    chunk: Optional[int] = None,
    soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # (Hq,) f32
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-read Pallas int4 decode attention; returns (B, Hq, hd).

    The packed cache streams once (vs twice for
    :func:`contiguous_decode_attention_xla4`) with nibble extraction and
    both pair-heads' attention fused in-kernel.  Semantics identical to
    the xla4 path / the :func:`contiguous_decode_attention_ref` twin.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, hd = q.shape
    hp = k_cache.shape[3]  # packed head pairs = Hkv/2
    hkv = 2 * hp
    groups = hq // hkv
    s = k_cache.shape[2] if s_bucket is None else min(s_bucket,
                                                      k_cache.shape[2])
    hb = hp
    if sinks is None:  # sinks need the whole head row resident
        while hb > 8 and (s * hb * hd * 2 * 2) > 4 << 20:
            hb //= 2
        while hp % hb:
            hb //= 2
        hb = max(hb, 1)
    # kv-major HF head order: q (B, Hkv, G, hd) → per-half (B, G, Hp, hd)
    qg = q.reshape(b, hkv, groups, hd)
    q_lo = qg[:, :hp].swapaxes(1, 2)
    q_hi = qg[:, hp:].swapaxes(1, 2)
    sinks_g = None
    if sinks is not None:
        # (G, 2·Hp): lo heads first, hi heads second (hb == hp with sinks)
        sinks_g = jnp.asarray(sinks, jnp.float32).reshape(hkv, groups).T
    o_lo, o_hi = _call_p4(q_lo, q_hi, k_cache, v_cache,
                          positions.astype(jnp.int32), sinks_g, layer=layer,
                          sm_scale=float(sm_scale), window=window,
                          chunk=chunk, soft_cap=soft_cap, hb=hb,
                          interpret=bool(interpret), s_used=s)
    out = jnp.concatenate([o_lo, o_hi], axis=2)  # (B, G, Hkv, hd)
    return out.swapaxes(1, 2).reshape(b, hq, hd)


def contiguous_decode_attention_xla4(
    q: jax.Array,  # (B, Hq, hd) — k-scale/q-scale already folded in
    k_cache: jax.Array,  # (L, B, S, Hkv/2, hd) nibble-packed int8
    v_cache: jax.Array,
    positions: jax.Array,  # (B,)
    layer: int,
    s_bucket: Optional[int] = None,
    sm_scale: float = 1.0,
    window: Optional[int] = None,
    chunk: Optional[int] = None,
    soft_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # (Hq,) f32
) -> jax.Array:
    """int4 decode attention as pure XLA: two fused einsums per K/V pass.

    A single-read path needs in-kernel unpack, but feeding the cache to an
    opaque Pallas kernel defeats XLA's in-place-update analysis for the
    same-step cache write — measured 3 extra full-cache copies per step
    (and an aliased row-DMA writer fared worse; see docs/STATUS.md).  Pure
    XLA instead reads the packed tensor twice — once per nibble half, the
    shift/convert fusing into each dot — so traffic matches int8 while
    HBM *capacity* halves, which is what doubles the servable batch.  The
    nibble layout is ``kv_cache.pack_int4_rows`` (head PAIRS share a byte,
    keeping the cache's minor dim at the full 128-lane ``hd``): the low
    pass dots against the first half of the kv heads' queries, the high
    pass against the second, and scores/PV concat along the head axis.
    """
    b, hq, hd = q.shape
    hp = k_cache.shape[3]  # packed head pairs = Hkv/2
    hkv = 2 * hp
    g = hq // hkv
    s = k_cache.shape[2] if s_bucket is None else min(s_bucket,
                                                      k_cache.shape[2])
    dt = q.dtype
    kp = k_cache[layer, :, :s]  # (B, S, Hkv/2, hd) int8
    vp = v_cache[layer, :, :s]
    # kv-major HF head order: q (B, Hkv, G, hd)
    qg = q.reshape(b, hkv, g, hd)
    q_lo, q_hi = qg[:, :hp], qg[:, hp:]
    k_lo = ((kp << 4) >> 4).astype(dt)  # sign-extended low nibble
    k_hi = (kp >> 4).astype(dt)
    scores = jnp.concatenate(
        [jnp.einsum("bkgd,bskd->bkgs", q_lo, k_lo),
         jnp.einsum("bkgd,bskd->bkgs", q_hi, k_hi)],
        axis=1).astype(jnp.float32) * sm_scale  # (B, Hkv, G, S)
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)
    sj = jnp.arange(s)[None, :]
    valid = sj <= positions[:, None]
    if window is not None:
        valid &= sj > positions[:, None] - window
    if chunk is not None:
        valid &= (sj // chunk) == (positions[:, None] // chunk)
    scores = jnp.where(valid[:, None, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    m = jnp.max(scores, axis=-1, keepdims=True)  # (B, Hkv, G, 1)
    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(1, hkv, g, 1)
        m = jnp.maximum(m, sk)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        l = l + jnp.exp(sk - m)
    pw = p.astype(dt)  # (B, Hkv, G, S)
    v_lo = ((vp << 4) >> 4).astype(dt)
    v_hi = (vp >> 4).astype(dt)
    ctx = jnp.concatenate(
        [jnp.einsum("bkgs,bskd->bkgd", pw[:, :hp], v_lo),
         jnp.einsum("bkgs,bskd->bkgd", pw[:, hp:], v_hi)],
        axis=1)  # (B, Hkv, G, hd)
    ctx = ctx.astype(jnp.float32) / l  # normalize in f32, like the kernel
    return ctx.astype(dt).reshape(b, hq, hd)


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
