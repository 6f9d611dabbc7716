"""Absorbed MLA decode: DeepSeek's compressed-KV serving path.

The naive MLA path (``models/llama.py::_mla_attn_mlp``) materializes
per-head keys/values and caches ``(B, S, nq, qk_head)`` padded K/V — for
DeepSeek-V3 shapes that is ~2 x 128 x 192 values per token.  The absorbed
form caches ONLY the per-token latent row ``[c_kv_norm | rope-key]``
(``kv_lora_rank + qk_rope_head_dim`` = 576 values for V3, ~85x less), the
trick that makes MLA's KV cache tiny:

    score_h(t) = q_nope_h · (W_uk_h ᵀ c_t) + q_rope_h · k_rope_t
               = (W_uk_h  q_nope_h) · c_t + q_rope_h · k_rope_t

so the query "absorbs" the key half of ``kv_b`` (per head) and attention
runs MQA-style over the shared latent; the attention-weighted latent
context then applies the value half:  ``out_h = W_uv_h ᵀ (Σ p_t c_t)``.
On TPU the win is exactly the KV HBM stream: decode reads ``S x 576``
values per layer instead of ``S x nq x 384`` — the difference between a
cache-bound and a weight-bound decode at DeepSeek scale.

``kv_b`` stays INT4-packed for the prefill/naive path; absorption needs
its transpose per head, so :func:`absorb_kv_b` dequantizes it once at
engine build into two small bf16 tensors (V3: ~25 MB total).  Prefill
runs the exact naive attention (prompt tokens need full per-head compute
anyway) and captures the latent rows via ``block_core(mla_lat_sink=...)``.

Numerics note: absorption reassociates the nope-score matmul
(``(q Wᵀ) c`` vs ``q (Wᵀ c)``) — bit-identical in exact arithmetic,
within float rounding here; greedy outputs match the naive engine in the
equivalence tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.ops.packing import PackedLinear, dequantize_dense
from gptq_v2_tpu.serving.model import PackedLlama, _lin, head_logits


class MLACache(NamedTuple):
    """Per-layer latent rows: ``lat[(L, B, S, kv_lora + rope_dim)]``."""

    lat: jax.Array

    @property
    def max_len(self) -> int:
        return self.lat.shape[2]


class MLAPagedCache(NamedTuple):
    """Paged latent rows for the ragged scheduler:
    ``lat[(L, n_pages, page_size, lat_dim)]`` — page 0 is the reserved
    trash page, exactly the ``PagedKVCache`` convention.  The latent is
    ~85x smaller per token than padded K/V at V3 shapes, so the ragged
    attention can afford a plain XLA page gather (no kernel needed:
    even at 4k context the per-step gather moves only ~MBs)."""

    lat: jax.Array

    @property
    def page_size(self) -> int:
        return self.lat.shape[2]


def init_mla_paged_cache(n_layers: int, n_pages: int, page_size: int,
                         lat_dim: int, dtype=jnp.bfloat16) -> MLAPagedCache:
    return MLAPagedCache(
        lat=jnp.zeros((n_layers, n_pages, page_size, lat_dim), dtype))


class AbsorbedKVB(NamedTuple):
    """Per-layer absorbed halves of ``kv_b`` (dense, small):
    ``wk[(nq, nope, kv_lora)]`` (key half, transposed for the q-side
    absorb) and ``wv[(nq, kv_lora, v_dim)]`` (value half)."""

    wk: Tuple[jax.Array, ...]
    wv: Tuple[jax.Array, ...]


def init_mla_cache(n_layers: int, batch: int, max_len: int, lat_dim: int,
                   dtype=jnp.bfloat16) -> MLACache:
    return MLACache(lat=jnp.zeros((n_layers, batch, max_len, lat_dim), dtype))


def calibrate_mla_scales(model: PackedLlama, tokens=None,
                         margin: float = 1.05) -> Tuple[float, ...]:
    """Per-layer symmetric int8 scales for the latent rows, calibrated on
    a short synthetic forward (mirrors ``model.calibrate_kv_scales``).
    Returns a static tuple of Python floats — no extra compiles."""
    cfg = model.cfg
    if tokens is None:
        tokens = jax.random.randint(
            jax.random.key(0),
            (2, min(128, cfg.max_position_embeddings)), 0, cfg.vocab_size)
    ropes = L.rope_tables(cfg, jnp.arange(tokens.shape[1]))
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    scales = []
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        sink: list = []

        def attn_fn(q, k, v):
            return L.attention(q, k, v, window=cfg.layer_window(li),
                               sm_scale=cfg.sm_scale_), None

        x, _ = L.block_core(cfg, lp, x, cos, sin,
                            lambda name, h, lp=lp: _lin(lp, name, h),
                            attn_fn, mla_lat_sink=sink)
        amax = float(jnp.max(jnp.abs(sink[0])))
        scales.append(max(amax * margin / 127.0, 1e-6))
    return tuple(scales)


def _quantize_row(row: jax.Array, scale: Optional[float]) -> jax.Array:
    if scale is None:
        return row
    return jnp.clip(jnp.round(row.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def absorb_kv_b(model: PackedLlama) -> AbsorbedKVB:
    """Dequantize every layer's ``kv_b`` into its absorbed halves."""
    cfg = model.cfg
    nope, vd = cfg.qk_nope_head_dim, cfg.v_head_dim
    wks, wvs = [], []
    for lp in model.layers:
        w = lp["self_attn.kv_b_proj"]
        dense = (dequantize_dense(w, dtype=model.embed_tokens.dtype)
                 if isinstance(w, PackedLinear) else jnp.asarray(w))
        # (kv_lora, nq*(nope+vd)) -> (kv_lora, nq, nope+vd)
        kv = dense.reshape(dense.shape[0], -1, nope + vd)
        wks.append(jnp.transpose(kv[..., :nope], (1, 2, 0)))  # (nq,nope,kvl)
        wvs.append(jnp.transpose(kv[..., nope:], (1, 0, 2)))  # (nq,kvl,vd)
    return AbsorbedKVB(wk=tuple(wks), wv=tuple(wvs))


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("scales",))
def mla_prefill(
    model: PackedLlama,
    tokens: jax.Array,  # (B, Lpad)
    cache: MLACache,
    lengths: jax.Array,  # (B,)
    slot: jax.Array,  # (B,)
    scales: Optional[Tuple[float, ...]] = None,  # per-layer int8 scales
):
    """Exact naive-attention prompt pass that caches LATENT rows.

    Pad-token rows steer to the trash position ``max_len - 1`` (rewritten
    before any query can attend it — the standard steering invariant).
    Returns ``(last-token logits (B, V), cache)``.
    """
    cfg = model.cfg
    b, lpad = tokens.shape
    positions = jnp.arange(lpad)
    ropes = L.rope_tables(cfg, positions)
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    pos_b = jnp.broadcast_to(positions[None], (b, lpad))
    pad_mask = pos_b >= lengths[:, None]
    lat = cache.lat
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        sink: list = []

        def attn_fn(q, k, v):
            a = L.attention(q, k, v, window=cfg.layer_window(li),
                            sm_scale=cfg.sm_scale_)
            return a, None

        x, _ = L.block_core(cfg, lp, x, cos, sin,
                            lambda name, h, lp=lp: _lin(lp, name, h),
                            attn_fn, mla_lat_sink=sink)
        row = sink[0]  # (B, Lpad, lat_dim)
        row = (_quantize_row(row, scales[li]) if scales is not None
               else row).astype(lat.dtype)
        wpos = jnp.where(pad_mask, cache.max_len - 1, pos_b)
        rows = jnp.broadcast_to(slot[:, None], wpos.shape)
        lat = lat.at[li, rows, wpos].set(row)
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0]
    return head_logits(cfg, model.lm_head, last), MLACache(lat=lat)


def _absorbed_q_and_row(cfg, lp, x, cos, sin, wk, lin=_lin):
    """The absorbed-attention front half shared by every MLA path:
    normalized input → absorbed queries ``q_eff (..., nq, lat)`` (key
    half of ``kv_b`` folded into q) and the new latent row(s)
    ``(..., lat)``; ``lin`` selects the single-device or TP column
    strategy.  Returns ``(h, q_eff, new_row)`` with ``h`` the
    input-normed hidden (the MLP path reuses it)."""
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
    nope, rd = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    h = L.rms_norm(x, lp["input_layernorm"], eps, uo)
    if cfg.q_lora_rank:
        qa = L.rms_norm(lin(lp, "self_attn.q_a_proj", h),
                        lp["self_attn.q_a_layernorm"], eps, uo)
        q = lin(lp, "self_attn.q_b_proj", qa)
    else:
        q = lin(lp, "self_attn.q_proj", h)
    q = q.reshape(*x.shape[:-1], -1, nope + rd)
    q_rot = L.apply_rope(q[..., nope:], cos, sin)
    q_lat = jnp.einsum("...hq,hqc->...hc",
                       q[..., :nope].astype(jnp.float32),
                       wk.astype(jnp.float32))
    q_eff = jnp.concatenate([q_lat.astype(q.dtype), q_rot], axis=-1)
    kv_a = lin(lp, "self_attn.kv_a_proj_with_mqa", h)
    c_kv_n = L.rms_norm(kv_a[..., :cfg.kv_lora_rank],
                        lp["self_attn.kv_a_layernorm"], eps, uo)
    k_rot = L.apply_rope(kv_a[..., None, cfg.kv_lora_rank:], cos, sin)
    new_row = jnp.concatenate([c_kv_n, k_rot[..., 0, :]], axis=-1)
    return h, q_eff, new_row


def _mla_absorbed_block(cfg, lp, wk, wv, x, cos, sin, lat_layer, positions,
                        key_mask, scale=None):
    """One decoder layer of absorbed decode: (B, 1, D) -> (B, 1, D) plus
    the new latent row to store."""
    b = x.shape[0]
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
    h, q_eff, new_row = _absorbed_q_and_row(cfg, lp, x, cos, sin, wk)
    lat_layer = lat_layer.at[jnp.arange(b)[:, None],
                             positions[:, None]].set(
        _quantize_row(new_row, scale).astype(lat_layer.dtype))
    keys = lat_layer[:, :, None, :]  # (B, S, 1, lat): MQA, one shared head
    qk = q_eff
    if scale is not None:  # int8 latent: fold the scale into q for the
        # scores; the values' scale multiplies the ctx afterwards
        qk = q_eff * jnp.asarray(scale, jnp.float32).astype(q_eff.dtype)
        keys = keys.astype(q_eff.dtype)
    # MQA over the shared latent: scores use the FULL qk head dim scale
    ctx = L.attention(qk, keys, keys[..., :cfg.kv_lora_rank],
                      causal_offset=None, key_mask=key_mask,
                      sm_scale=cfg.sm_scale_)  # (B, 1, nq, kv_lora)
    if scale is not None:
        ctx = ctx * jnp.asarray(scale, ctx.dtype)
    # apply the value half:  out_h = ctx_h W_uv_h
    out = jnp.einsum("bnhc,hcv->bnhv", ctx.astype(jnp.float32),
                     wv.astype(jnp.float32)).astype(x.dtype)
    o = _lin(lp, "self_attn.o_proj", out.reshape(b, 1, -1))
    x = x + o
    h = L.rms_norm(x, lp["post_attention_layernorm"], eps, uo)
    mlp = L._mlp_tail(cfg, lp, lambda name, t: _lin(lp, name, t), h, None)
    return x + mlp, lat_layer


def shard_absorbed(absorbed: AbsorbedKVB, mesh, tp: int) -> AbsorbedKVB:
    """Head-shard the absorbed halves over the ``model`` axis: device ``d``
    owns heads ``[d·nq/tp, (d+1)·nq/tp)`` — the same contiguous head split
    as ``split_packed_column`` applies to ``q_b``, so local q heads and
    local ``wk/wv`` line up.  Arrays gain a leading ``(tp,)`` stack dim
    sharded over ``model`` (the ``parallel/tp.py`` convention)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gptq_v2_tpu.parallel.mesh import MODEL_AXIS

    def shard(per_layer):
        out = []
        for w in per_layer:
            nq = w.shape[0]
            assert nq % tp == 0, (nq, tp)
            stacked = jnp.stack(jnp.split(jnp.asarray(w), tp, axis=0))
            out.append(jax.device_put(
                stacked, NamedSharding(mesh, P(MODEL_AXIS))))
        return tuple(out)

    return AbsorbedKVB(wk=shard(absorbed.wk), wv=shard(absorbed.wv))


def build_tp_mla_prefill(mesh, scales: Optional[Tuple[float, ...]] = None):
    """Tensor-parallel absorbed-MLA prefill (contract of
    :func:`mla_prefill`): the exact naive per-head attention runs with the
    standard Megatron strategy (``q_b``/``kv_b`` column-parallel by heads,
    ``o`` row-parallel) while the latent rows — built from the replicated
    ``kv_a`` path inside ``block_core`` — are captured identically on every
    device and written to the replicated latent cache."""
    from jax.sharding import PartitionSpec as P

    from gptq_v2_tpu.parallel.tp import _tp_lin, make_ep_moe_fn

    def local_step(model, cache, tokens, lengths, slot):
        cfg = model.cfg
        b, lpad = tokens.shape
        positions = jnp.arange(lpad)
        ropes = L.rope_tables(cfg, positions)
        x = L.embed_lookup(cfg, model.embed_tokens, tokens)
        pos_b = jnp.broadcast_to(positions[None], (b, lpad))
        pad_mask = pos_b >= lengths[:, None]
        lat = cache.lat
        for li, lp in enumerate(model.layers):
            cos, sin = ropes[cfg.layer_rope(li)]
            sink: list = []

            def attn_fn(q, k, v, li=li):
                return L.attention(q, k, v, window=cfg.layer_window(li),
                                   sm_scale=cfg.sm_scale_), None

            x, _ = L.block_core(cfg, lp, x, cos, sin, _tp_lin(lp), attn_fn,
                                moe_fn=make_ep_moe_fn(cfg, model.tp, lp),
                                mla_lat_sink=sink)
            row = sink[0]
            row = (_quantize_row(row, scales[li]) if scales is not None
                   else row).astype(lat.dtype)
            wpos = jnp.where(pad_mask, cache.max_len - 1, pos_b)
            rows = jnp.broadcast_to(slot[:, None], wpos.shape)
            lat = lat.at[li, rows, wpos].set(row)
        x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
        last = jnp.take_along_axis(x, (lengths - 1)[:, None, None],
                                   axis=1)[:, 0]
        from gptq_v2_tpu.parallel.tp import _plain_linear

        logits = L.soft_cap(_plain_linear(model.lm_head, last),
                            cfg.final_logit_softcap)
        if cfg.logits_divider is not None:
            logits = logits / cfg.logits_divider
        return logits, MLACache(lat=lat)

    def sharded(model, tokens, cache, lengths, slot):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(model.specs(), MLACache(lat=P()), P(), P(), P()),
            out_specs=(P(), MLACache(lat=P())),
            check_vma=False,
        )(model, cache, tokens, lengths, slot)

    return jax.jit(sharded, donate_argnums=(2,))


def build_tp_mla_decode_step(mesh, scales: Optional[Tuple[float, ...]] = None):
    """Tensor-parallel absorbed-MLA decode+sample step (same contract as
    :func:`mla_decode_sample_step`).  Returns ``(step, loop)`` — ``loop``
    is the round-5 multi-step fori tick (``mla_decode_sample_loop``'s
    contract minus ``scales``), sharing the same device-local body so
    TP-absorbed serving also amortizes the per-token host sync.

    Layout (the natural DeepSeek-scale TP): ``q_b`` column-parallel by
    whole heads (already so in ``tp.shard_packed_llama``), the absorbed
    ``wk/wv`` halves sharded by the same heads (:func:`shard_absorbed`),
    the tiny latent projections (``q_a``/``kv_a``) and the latent cache
    REPLICATED (~576 values/token at V3 shapes — replicating it costs
    ~nothing and saves the per-token gather), ``o_proj`` row-parallel with
    one psum, MLP through the standard Megatron strategy.  Every device
    computes the identical new latent row from the replicated ``kv_a``,
    so the cache replicas stay consistent by construction.
    """
    from jax.sharding import PartitionSpec as P

    from gptq_v2_tpu.parallel.tp import (_col_lin, _gather_cols, _row_lin,
                                         _tp_lin, make_ep_moe_fn)
    from gptq_v2_tpu.serving.decode import sample_per_row

    def local_body(model, absorbed, lat, tokens, positions, s):
        """One absorbed TP decode step on the device-local view: returns
        ``(logits, lat)``; shared by the single-step and fori-loop
        builders."""
        cfg = model.cfg
        eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
        b = tokens.shape[0]
        ropes = [(c[:, None, :], s_[:, None, :])
                 for c, s_ in L.rope_tables(cfg, positions)]
        x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]
        key_mask = jnp.arange(s)[None, :] <= positions[:, None]
        for li, lp in enumerate(model.layers):
            cos, sin = ropes[cfg.layer_rope(li)]
            wk = absorbed.wk[li][0]  # (nq_loc, nope, kvl) local head shard
            wv = absorbed.wv[li][0]
            scale = None if scales is None else scales[li]
            lat_li = lat[li, :, :s]
            # q path on local head shards; the latent path is replicated
            # (identical on every device) — _col_lin covers both
            h, q_eff, new_row = _absorbed_q_and_row(cfg, lp, x, cos, sin,
                                                    wk, lin=_col_lin)
            lat_li = lat_li.at[jnp.arange(b)[:, None],
                               positions[:, None]].set(
                _quantize_row(new_row, scale).astype(lat_li.dtype))
            keys = lat_li[:, :, None, :]
            qk = q_eff
            if scale is not None:
                qk = q_eff * jnp.asarray(scale, jnp.float32).astype(q_eff.dtype)
                keys = keys.astype(q_eff.dtype)
            ctx = L.attention(qk, keys, keys[..., :cfg.kv_lora_rank],
                              causal_offset=None, key_mask=key_mask,
                              sm_scale=cfg.sm_scale_)  # (B,1,nq_loc,kvl)
            if scale is not None:
                ctx = ctx * jnp.asarray(scale, ctx.dtype)
            out = jnp.einsum("bnhc,hcv->bnhv", ctx.astype(jnp.float32),
                             wv.astype(jnp.float32)).astype(x.dtype)
            # row-parallel o: gather the head-sharded features (act-order
            # packed rows may mix shards), one psum inside _row_lin
            o = _row_lin(lp, "self_attn.o_proj",
                         _gather_cols(out.reshape(b, 1, -1)))
            x = x + o
            h = L.rms_norm(x, lp["post_attention_layernorm"], eps, uo)
            mlp = L._mlp_tail(cfg, lp, _tp_lin(lp), h,
                              make_ep_moe_fn(cfg, model.tp, lp))
            x = x + mlp
            lat = lat.at[li, :, :s].set(lat_li)
        x = L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                       cfg.norm_unit_offset)
        from gptq_v2_tpu.parallel.tp import _plain_linear

        logits = L.soft_cap(_plain_linear(model.lm_head, x),
                            cfg.final_logit_softcap)
        if cfg.logits_divider is not None:
            logits = logits / cfg.logits_divider
        return logits, lat

    def local_step(model, absorbed, cache, tokens, positions, temperatures,
                   key, top_ks, top_ps, min_ps, s_bucket=None,
                   return_logprobs=False):
        s = cache.max_len if s_bucket is None else min(cache.max_len,
                                                       s_bucket)
        logits, lat = local_body(model, absorbed, cache.lat, tokens,
                                 positions, s)
        key, sub = jax.random.split(key)
        toks = sample_per_row(logits, sub, temperatures,
                              top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
        if return_logprobs:
            from gptq_v2_tpu.serving.decode import (chosen_logprob,
                                                    pack_tok_logprob)

            toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
        return toks, MLACache(lat=lat), key

    def sharded(model, absorbed, cache, tokens, positions, temperatures,
                key, s_bucket=None, top_ks=None, top_ps=None, min_ps=None,
                return_logprobs=False):
        from gptq_v2_tpu.parallel.mesh import MODEL_AXIS

        aspec = AbsorbedKVB(wk=tuple(P(MODEL_AXIS) for _ in absorbed.wk),
                            wv=tuple(P(MODEL_AXIS) for _ in absorbed.wv))
        return jax.shard_map(
            functools.partial(local_step, s_bucket=s_bucket,
                              return_logprobs=return_logprobs),
            mesh=mesh,
            in_specs=(model.specs(), aspec, MLACache(lat=P()), P(), P(),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), MLACache(lat=P()), P()),
            check_vma=False,
        )(model, absorbed, cache, tokens, positions, temperatures, key,
          top_ks, top_ps, min_ps)

    def make_local_loop(n_steps, s_bucket, return_logprobs):
        def local_loop(model, absorbed, cache, tokens, positions,
                       temperatures, key, top_ks, top_ps, min_ps):
            from gptq_v2_tpu.serving.decode import fori_sample_scaffold

            s = cache.max_len if s_bucket is None else min(cache.max_len,
                                                           s_bucket)
            out, lat, key = fori_sample_scaffold(
                n_steps, tokens, cache.lat, key,
                lambda i, toks, lat: local_body(model, absorbed, lat, toks,
                                                positions + i, s),
                temperatures, top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
                return_logprobs=return_logprobs)
            return out, MLACache(lat=lat), key
        return local_loop

    def sharded_loop(model, absorbed, cache, tokens, positions,
                     temperatures, key, n_steps, s_bucket=None, top_ks=None,
                     top_ps=None, min_ps=None, return_logprobs=False):
        from gptq_v2_tpu.parallel.mesh import MODEL_AXIS

        aspec = AbsorbedKVB(wk=tuple(P(MODEL_AXIS) for _ in absorbed.wk),
                            wv=tuple(P(MODEL_AXIS) for _ in absorbed.wv))
        return jax.shard_map(
            make_local_loop(n_steps, s_bucket, return_logprobs), mesh=mesh,
            in_specs=(model.specs(), aspec, MLACache(lat=P()), P(), P(),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), MLACache(lat=P()), P()),
            check_vma=False,
        )(model, absorbed, cache, tokens, positions, temperatures, key,
          top_ks, top_ps, min_ps)

    return (jax.jit(sharded, donate_argnums=(2,),
                    static_argnames=("s_bucket", "return_logprobs")),
            jax.jit(sharded_loop, donate_argnums=(2,),
                    static_argnames=("n_steps", "s_bucket",
                                     "return_logprobs")))


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("s_bucket", "scales", "return_logprobs"))
def mla_decode_sample_step(
    model: PackedLlama,
    absorbed: AbsorbedKVB,
    cache: MLACache,
    tokens: jax.Array,  # (B,)
    positions: jax.Array,  # (B,)
    temperatures: jax.Array,  # (B,)
    key: jax.Array,
    s_bucket: Optional[int] = None,
    scales: Optional[Tuple[float, ...]] = None,
    top_ks: Optional[jax.Array] = None,  # (B,) per-row warpers (round-5)
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, MLACache, jax.Array]:
    """One absorbed decode step + sampling + key split in ONE dispatch
    (mirrors ``decode.decode_sample_step``'s contract, incl. per-row
    warped sampling and the packed token+logprob readback)."""
    from gptq_v2_tpu.serving.decode import (chosen_logprob, pack_tok_logprob,
                                            sample_per_row)

    cfg = model.cfg
    s = cache.max_len if s_bucket is None else min(cache.max_len, s_bucket)
    ropes = [(c[:, None, :], s_[:, None, :])
             for c, s_ in L.rope_tables(cfg, positions)]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]
    key_mask = jnp.arange(s)[None, :] <= positions[:, None]
    lat = cache.lat
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        x, lat_li = _mla_absorbed_block(
            cfg, lp, absorbed.wk[li], absorbed.wv[li], x, cos, sin,
            lat[li, :, :s], positions, key_mask,
            scale=None if scales is None else scales[li])
        lat = lat.at[li, :, :s].set(lat_li)
    x = L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                   cfg.norm_unit_offset)
    logits = head_logits(cfg, model.lm_head, x)
    key, sub = jax.random.split(key)
    toks = sample_per_row(logits, sub, temperatures,
                          top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
    if return_logprobs:
        toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
    return toks, MLACache(lat=lat), key


@functools.partial(jax.jit, donate_argnums=(3,),
                   static_argnames=("scales", "return_logprobs"))
def mla_ragged_step(
    model: PackedLlama,
    absorbed: AbsorbedKVB,
    tokens: jax.Array,  # (T,) new tokens, grouped by sequence (padded)
    cache: MLAPagedCache,
    positions: jax.Array,  # (T,) each token's position in its sequence
    tok_pages: jax.Array,  # (T,) destination page (0 = trash for padding)
    tok_offs: jax.Array,  # (T,) in-page offset
    block_tables: jax.Array,  # (S, max_pages)
    kv_lens: jax.Array,  # (S,) context length per seq incl. new tokens
    cu_q_lens: jax.Array,  # (S+1,) cumulative new-token counts
    num_seqs: jax.Array,  # (1,) int32
    sample_rows: jax.Array,  # (S,) row of each sequence's last token
    temperatures: jax.Array,  # (S,)
    key: jax.Array,
    top_ks: Optional[jax.Array] = None,
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    scales: Optional[Tuple[float, ...]] = None,  # int8 latent per layer
    return_logprobs: bool = False,
):
    """Mixed prefill+decode tick over the PAGED latent cache (round-5:
    MLA-absorbed composes with the ragged scheduler / chunked prefill).

    Same contract as ``decode.ragged_step``.  Per layer: build absorbed
    queries for every row, write each row's latent at its host-computed
    (page, offset) slot, gather each row's sequence pages (cheap — the
    latent is one ~576-value row/token), and run MQA attention with
    in-run causal masking.  Prefill chunks run the ABSORBED attention
    math (the phased engine prefills with exact naive attention; the two
    are algebraically identical, within float reassociation — the parity
    test bounds the drift)."""
    from gptq_v2_tpu.serving.decode import (chosen_logprob, pack_tok_logprob,
                                            sample_per_row)

    cfg = model.cfg
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
    t = tokens.shape[0]
    ps = cache.page_size
    mp = block_tables.shape[1]
    s_kv = mp * ps
    ropes = [(c[:, None, :], s_[:, None, :])  # (T, 1, rd)
             for c, s_ in L.rope_tables(cfg, positions)]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]  # (T,1,D)

    # row -> sequence map + in-run causal data (decode.paged_ragged twin)
    rows = jnp.arange(t)
    seg = jnp.searchsorted(cu_q_lens[1:], rows, side="right")
    seg = jnp.minimum(seg, block_tables.shape[0] - 1)
    valid_row = rows < cu_q_lens[jnp.minimum(num_seqs[0],
                                             block_tables.shape[0])]
    # token rows process in fixed chunks (lax.map below) so the per-row
    # sequence-page gather transient is bounded at (CH, s_kv, lat) per
    # chunk instead of (T, s_kv, lat) for the whole tick — prefill chunks
    # of one long sequence would otherwise duplicate its pages per token
    ch = min(16, t)
    t_pad = -(-t // ch) * ch

    lat = cache.lat
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        wk, wv = absorbed.wk[li], absorbed.wv[li]
        scale = None if scales is None else scales[li]
        h, q_eff4, new_row = _absorbed_q_and_row(cfg, lp, x, cos, sin, wk)
        q_eff = q_eff4[:, 0]  # (T, nq, lat)
        lat = lat.at[li, tok_pages, tok_offs].set(
            _quantize_row(new_row[:, 0], scale).astype(lat.dtype))

        # chunked per-row attention: gather + score CH rows at a time
        qk = q_eff
        if scale is not None:  # int8 latent: fold the scale into q
            qk = q_eff * jnp.asarray(scale, jnp.float32).astype(q_eff.dtype)

        def pad_rows(a):
            return jnp.pad(a, ((0, t_pad - t),) + ((0, 0),) * (a.ndim - 1))

        lat_li = lat[li]

        def attn_chunk(args):
            q_c, seg_c, pos_c, valid_c = args
            keys_c = jnp.take(lat_li, block_tables[seg_c], axis=0).reshape(
                ch, s_kv, -1)
            if scale is not None:
                keys_c = keys_c.astype(q_c.dtype)
            sc = jnp.einsum("thl,tsl->ths", q_c, keys_c,
                            preferred_element_type=jnp.float32)
            sc = sc * cfg.sm_scale_
            kj = jnp.arange(s_kv)[None, :]
            m = ((kj <= pos_c[:, None]) & (kj < kv_lens[seg_c][:, None])
                 & valid_c[:, None])
            sc = jnp.where(m[:, None, :], sc, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(sc, axis=-1)
            p = jnp.where(valid_c[:, None, None], p, 0.0)
            return jnp.einsum("ths,tsl->thl", p.astype(keys_c.dtype),
                              keys_c[..., :cfg.kv_lora_rank])

        ctx = jax.lax.map(attn_chunk, (
            pad_rows(qk).reshape(t_pad // ch, ch, *qk.shape[1:]),
            pad_rows(seg).reshape(-1, ch),
            pad_rows(positions).reshape(-1, ch),
            pad_rows(valid_row).reshape(-1, ch),
        )).reshape(t_pad, *q_eff.shape[1:-1], cfg.kv_lora_rank)[:t]
        if scale is not None:
            ctx = ctx * jnp.asarray(scale, ctx.dtype)
        out = jnp.einsum("thc,hcv->thv", ctx.astype(jnp.float32),
                         wv.astype(jnp.float32)).astype(x.dtype)
        o = _lin(lp, "self_attn.o_proj", out.reshape(t, 1, -1))
        x = x + o
        h = L.rms_norm(x, lp["post_attention_layernorm"], eps, uo)
        mlp = L._mlp_tail(cfg, lp, lambda name, tt, lp=lp: _lin(lp, name, tt),
                          h, None)
        x = x + mlp

    hid = L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                     cfg.norm_unit_offset)
    last = jnp.take(hid, sample_rows, axis=0)
    logits = head_logits(cfg, model.lm_head, last)
    key, sub = jax.random.split(key)
    toks = sample_per_row(logits, sub, temperatures,
                          top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
    if return_logprobs:
        toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
    return toks, MLAPagedCache(lat=lat), key


@functools.partial(jax.jit, donate_argnums=(3,),
                   static_argnames=("scales", "s_bucket"))
def mla_verify_chunk(
    model: PackedLlama,
    absorbed: AbsorbedKVB,
    tokens: jax.Array,  # (B, Q) chunk tokens per slot
    cache: MLACache,
    positions: jax.Array,  # (B,) position of each chunk's FIRST token
    scales: Optional[Tuple[float, ...]] = None,
    s_bucket: Optional[int] = None,  # bound attended context (power-of-2)
):
    """Speculative chunk verification over the absorbed LATENT cache
    (round-5: the last MLA composition hole).  The target scores every
    chunk position in ONE dispatch — same contract as
    ``speculative.verify_chunk``: ``(logits (B, Q, V), cache)``.

    Latent rows for all Q chunk positions write first, then each query
    attends the latent with a per-row causal offset (a rejected token's
    row is rewritten by the next tick's chunk before any later query can
    attend it — the standard no-rollback invariant, unchanged because
    the latent row at position p is only read by queries at >= p)."""
    cfg = model.cfg
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
    b, qn = tokens.shape
    s = cache.max_len if s_bucket is None else min(cache.max_len, s_bucket)
    pos_b = positions[:, None] + jnp.arange(qn)[None]  # (B, Q)
    ropes = [(c.reshape(b, qn, -1), s_.reshape(b, qn, -1))
             for c, s_ in L.rope_tables(cfg, pos_b.reshape(-1))]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)  # (B, Q, D)
    key_mask = (jnp.arange(s)[None, None, :]
                <= pos_b[:, :, None])  # (B, Q, S)
    lat = cache.lat
    rows_b = jnp.broadcast_to(jnp.arange(b)[:, None], pos_b.shape)
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        wk, wv = absorbed.wk[li], absorbed.wv[li]
        scale = None if scales is None else scales[li]
        h, q_eff, new_rows = _absorbed_q_and_row(cfg, lp, x, cos, sin, wk)
        lat = lat.at[li, rows_b, pos_b].set(
            _quantize_row(new_rows, scale).astype(lat.dtype))

        keys = lat[li, :, :s]  # (B, s, lat)
        qk = q_eff
        if scale is not None:
            qk = q_eff * jnp.asarray(scale, jnp.float32).astype(q_eff.dtype)
            keys = keys.astype(q_eff.dtype)
        scores = jnp.einsum("bnhl,bsl->bnhs", qk, keys,
                            preferred_element_type=jnp.float32)
        scores = scores * cfg.sm_scale_
        scores = jnp.where(key_mask[:, :, None, :], scores,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnhs,bsl->bnhl", probs.astype(keys.dtype),
                         keys[..., :cfg.kv_lora_rank])
        if scale is not None:
            ctx = ctx * jnp.asarray(scale, ctx.dtype)
        out = jnp.einsum("bnhc,hcv->bnhv", ctx.astype(jnp.float32),
                         wv.astype(jnp.float32)).astype(x.dtype)
        o = _lin(lp, "self_attn.o_proj", out.reshape(b, qn, -1))
        x = x + o
        h = L.rms_norm(x, lp["post_attention_layernorm"], eps, uo)
        mlp = L._mlp_tail(cfg, lp, lambda name, t, lp=lp: _lin(lp, name, t),
                          h, None)
        x = x + mlp
    hid = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    return head_logits(cfg, model.lm_head, hid), MLACache(lat=lat)


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("n_steps", "s_bucket", "scales",
                                    "return_logprobs"))
def mla_decode_sample_loop(
    model: PackedLlama,
    absorbed: AbsorbedKVB,
    cache: MLACache,
    tokens: jax.Array,  # (B,) last sampled token per slot
    positions: jax.Array,  # (B,) position of the FIRST new token
    temperatures: jax.Array,  # (B,)
    key: jax.Array,
    n_steps: int,
    s_bucket: Optional[int] = None,  # must cover positions + n_steps
    scales: Optional[Tuple[float, ...]] = None,
    top_ks: Optional[jax.Array] = None,
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, MLACache, jax.Array]:
    """``n_steps`` fused absorbed-decode+sample steps under ONE
    ``lax.fori_loop`` dispatch — the MLA twin of
    ``decode.decode_sample_loop`` (round-5: multi-step now composes with
    MLA-absorbed serving, so the flagship DeepSeek path stops paying a
    per-token host sync).  Same PRNG chain and semantics as k calls of
    :func:`mla_decode_sample_step`; the donated latent cache updates in
    place across iterations."""
    from gptq_v2_tpu.serving.decode import fori_sample_scaffold

    cfg = model.cfg
    s = cache.max_len if s_bucket is None else min(cache.max_len, s_bucket)

    def step_fn(i, toks, lat):
        pos = positions + i
        ropes = [(c[:, None, :], s_[:, None, :])
                 for c, s_ in L.rope_tables(cfg, pos)]
        x = L.embed_lookup(cfg, model.embed_tokens, toks)[:, None, :]
        key_mask = jnp.arange(s)[None, :] <= pos[:, None]
        for li, lp in enumerate(model.layers):
            cos, sin = ropes[cfg.layer_rope(li)]
            x, lat_li = _mla_absorbed_block(
                cfg, lp, absorbed.wk[li], absorbed.wv[li], x, cos, sin,
                lat[li, :, :s], pos, key_mask,
                scale=None if scales is None else scales[li])
            lat = lat.at[li, :, :s].set(lat_li)
        x = L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                       cfg.norm_unit_offset)
        return head_logits(cfg, model.lm_head, x), lat

    out, lat, key = fori_sample_scaffold(
        n_steps, tokens, cache.lat, key, step_fn, temperatures,
        top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
        return_logprobs=return_logprobs)
    return out, MLACache(lat=lat), key
