"""W4A16 packed Llama for serving.

The inference-engine half the reference lacks entirely (it evaluates by
dequantizing back to fp16 ``nn.Linear``, reference ``quant.py:262-279``;
SURVEY.md §0 "What the reference is NOT").  Linear weights live as
:class:`PackedLinear` int4 and every projection runs through the fused
dequant-matmul Pallas kernel; everything else (norms, rope, attention,
embeddings, lm_head) is bf16.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.ops.packing import PackedLinear, pack_quant_meta, dequantize_dense
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedLlama:
    cfg: L.LlamaConfig  # static
    embed_tokens: jax.Array  # (V, D)
    layers: Tuple[Dict[str, Any], ...]  # per layer: name -> PackedLinear | array
    norm: jax.Array
    lm_head: jax.Array  # (D, V) dense (reference never quantizes lm_head)

    def tree_flatten(self):
        return ((self.embed_tokens, self.layers, self.norm, self.lm_head),
                (self.cfg,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children)


def quantize_params_to_packed(
    cfg: L.LlamaConfig,
    params: L.Params,
    quant_data: Dict[str, dict],
    compute_dtype=jnp.bfloat16,
    quantize_lm_head: bool = False,
    lm_head_group_size: int = 128,
) -> PackedLlama:
    """Build a packed model from pipeline output ``results['data']``.

    ``params`` supplies the non-quantized leaves (norms, embeddings,
    lm_head); each linear with an entry in ``quant_data`` becomes a
    :class:`PackedLinear`.  ``quantize_lm_head`` additionally RTN-packs the
    lm_head to INT4 (the reference never quantizes it, so this is opt-in;
    saves ~6% decode HBM traffic at 7B for a small ppl cost).
    """
    layers: List[Dict[str, Any]] = []
    for li, lp in enumerate(params["layers"]):
        out: Dict[str, Any] = {}
        for name, w in lp.items():
            key = f"model.layers.{li}.{name}"
            if key in quant_data:
                qm = quant_data[key]
                bits_u = np.unique(np.asarray(qm["group_bit_widths"]))
                if bits_u.size == 1 and int(bits_u[0]) in (2, 3, 4, 8):
                    # 3-bit packs as a BitSlicedLinear (2+1 bit planes)
                    out[name] = pack_quant_meta(qm, compute_dtype)
                else:  # mixed bit widths: no packed layout — serve dense
                    from gptq_v2_tpu.quant.quantizer import reconstruct_weight

                    out[name] = reconstruct_weight(qm).astype(compute_dtype)
            else:
                out[name] = jnp.asarray(w).astype(compute_dtype)
        layers.append(out)
    if quantize_lm_head:
        from gptq_v2_tpu.ops.packing import rtn_pack_dense

        lm_head = rtn_pack_dense(np.asarray(params["lm_head"]),
                                 lm_head_group_size, compute_dtype)
    else:
        lm_head = jnp.asarray(params["lm_head"]).astype(compute_dtype)
    return PackedLlama(
        cfg=cfg,
        embed_tokens=jnp.asarray(params["embed_tokens"]).astype(compute_dtype),
        layers=tuple(layers),
        norm=jnp.asarray(params["norm"]).astype(compute_dtype),
        lm_head=lm_head,
    )


def _linear(w, x: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    from gptq_v2_tpu.ops.packing import BitSlicedLinear

    packed = isinstance(w, (PackedLinear, BitSlicedLinear))
    y = w4a16_matmul(x, w) if packed else x @ w
    return y if bias is None else y + bias


def _lin(lp: Dict[str, Any], name: str, x: jax.Array) -> jax.Array:
    return _linear(lp[name], x, lp.get(name + ".bias"))


def head_logits(cfg: L.LlamaConfig, lm_head, hidden: jax.Array) -> jax.Array:
    """lm_head projection + the family's final-logit softcap (Gemma-2) /
    logits divider (Granite)."""
    logits = L.soft_cap(_linear(lm_head, hidden), cfg.final_logit_softcap)
    if cfg.logits_divider is not None:
        logits = logits / cfg.logits_divider
    return logits


def packed_block_apply(
    cfg: L.LlamaConfig,
    lp: Dict[str, Any],
    x: jax.Array,  # (B, N, D)
    cos: jax.Array,
    sin: jax.Array,
    kv_override: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    window: Optional[int] = L.AUTO_WINDOW,
    chunk: Optional[int] = None,  # Llama-4 chunked attention
    q_scale: Optional[jax.Array] = None,  # Llama-4 NoPE temperature
    qk_l2: Optional[bool] = None,  # Llama-4 per-layer L2 norm
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One decoder block on packed weights.

    Returns ``(hidden, (k, v))`` — the *new* rope'd K/V for cache writing.
    ``kv_override = (k_all, v_all, key_mask)`` runs attention against an
    externally assembled K/V sequence (decode against the paged cache),
    masking invalid cache slots instead of causal masking.
    ``window``: this layer's sliding window (``cfg.layer_window(li)`` for
    per-layer families); default applies ``cfg.sliding_window`` uniformly.
    """
    if window == L.AUTO_WINDOW:
        window = cfg.sliding_window

    def attn_fn(q, k, v):
        if kv_override is not None:
            k_all, v_all, key_mask = kv_override
            attn = L.attention(q, k_all, v_all, causal_offset=None,
                               key_mask=key_mask, sm_scale=cfg.sm_scale_,
                               logit_cap=cfg.attn_logit_softcap,
                               sinks=lp.get("self_attn.sinks"),
                               q_scale=q_scale)
        else:
            attn = L.attention(q, k, v, window=window,
                               sm_scale=cfg.sm_scale_,
                               logit_cap=cfg.attn_logit_softcap,
                               sinks=lp.get("self_attn.sinks"),
                               chunk=chunk, q_scale=q_scale)
        return attn, (k, v)

    return L.block_core(cfg, lp, x, cos, sin,
                        lambda name, h: _lin(lp, name, h), attn_fn,
                        qk_l2=qk_l2)


def packed_forward_logits(model: PackedLlama, tokens: jax.Array) -> jax.Array:
    """Full-sequence forward (eval / tests). tokens: (B, N)."""
    cfg = model.cfg
    ropes = L.rope_tables(cfg, jnp.arange(tokens.shape[1]))
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    positions = jnp.arange(tokens.shape[1])
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = packed_block_apply(cfg, lp, x, cos, sin,
                                  window=cfg.layer_window(li),
                                  chunk=cfg.layer_chunk(li),
                                  q_scale=L.layer_q_scale(cfg, li, positions),
                                  qk_l2=cfg.layer_qk_l2(li))
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    return head_logits(cfg, model.lm_head, x)


def random_packed_llama(
    cfg: L.LlamaConfig,
    group_size: int = 128,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    act_order: bool = True,
) -> PackedLlama:
    """Synthetic packed model with real shapes/layouts (bench + dry runs).

    Packed fields are generated directly (random nibbles, small positive
    scales, random zero-points, random act-order permutation) — the compiled
    decode graph and its HBM traffic are identical to a truly quantized
    model's, without paying quantization time.
    """
    g = group_size
    per_layer = [L.layer_param_shapes(cfg, i)
                 for i in range(cfg.num_hidden_layers)]
    n_keys = sum(len(sh) + 1 for sh in per_layer) + 2
    keys = iter(jax.random.split(jax.random.key(seed), n_keys))

    def packed(c, r):
        # generated on-device: a 7B model is ~4GB, host gen + transfer over
        # a tunneled TPU would dominate benchmark setup time
        c_pad = -(-c // (8 * g)) * (8 * g)
        n_g = c_pad // g
        k1, k2, k3, k4 = jax.random.split(next(keys), 4)
        qweight = jax.lax.bitcast_convert_type(
            jax.random.bits(k1, (c_pad // 8, r), jnp.uint32), jnp.int32)
        scales = (jax.random.uniform(k2, (n_g, r), jnp.float32) + 0.5) * (0.2 / np.sqrt(c))
        if n_g * g > c:  # zero out padding groups
            scales = scales.at[c // g:].set(0.0)
        zeros = jax.random.randint(k3, (n_g, r), 0, 16).astype(jnp.float32)
        perm = jax.random.permutation(k4, c).astype(jnp.int32) if act_order else None
        return PackedLinear(
            qweight=qweight,
            scales=scales.astype(compute_dtype),
            zeros=zeros.astype(compute_dtype),
            perm=perm,
            group_size=g, in_features=c,
        )

    def dense(*shape):
        scale = 1.0 / np.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(compute_dtype)

    norm_init = jnp.zeros if cfg.norm_unit_offset else jnp.ones
    layers = []
    for shapes in per_layer:
        lp = {}
        for name, shape in shapes.items():
            if len(shape) == 1:
                lp[name] = norm_init(shape, compute_dtype)
            elif name in L.NON_QUANTIZED_LINEARS:
                lp[name] = dense(*shape)  # MoE router stays bf16
            else:
                lp[name] = packed(*shape)
        layers.append(lp)
    return PackedLlama(
        cfg=cfg,
        embed_tokens=dense(cfg.vocab_size, cfg.hidden_size),
        layers=tuple(layers),
        norm=norm_init((cfg.hidden_size,), compute_dtype),
        lm_head=dense(cfg.hidden_size, cfg.vocab_size),
    )


@functools.partial(jax.jit, static_argnums=(0, 5))
def _block_kv_amax(cfg, lp, x, cos, sin, window=L.AUTO_WINDOW):
    x, (k, v) = packed_block_apply(cfg, lp, x, cos, sin, window=window)
    # (n_kv,) per-head amax; callers reduce to a scalar for int8
    ka = jnp.max(jnp.abs(k), axis=(0, 1, 3))
    va = jnp.max(jnp.abs(v), axis=(0, 1, 3))
    return x, ka, va


def calibrate_kv_scales(
    model: PackedLlama,
    tokens: Optional[jax.Array] = None,
    margin: float = 1.05,
    bits: int = 8,
) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Per-layer symmetric scales for int8/int4 KV storage: ``amax/qmax``
    of each layer's rope'd K and V over a short forward (pass real prompt
    ``tokens`` for text-statistics calibration; default is a synthetic
    batch).  Returns ``(k_scales, v_scales)``, static jit constants so
    per-layer scales cost no extra compiles: for int8, tuples of Python
    floats (one per layer, the scalar folds into q); for int4, tuples of
    per-KV-HEAD float tuples — at 15 levels a per-head range matters, and
    the per-head fold is just as free (k into the head's q group, v onto
    the head's output slice)."""
    cfg = model.cfg
    qmax = {8: 127.0, 4: 7.0}[bits]
    if tokens is None:
        tokens = jax.random.randint(
            jax.random.key(0),
            (2, min(128, cfg.max_position_embeddings)), 0, cfg.vocab_size)
    ropes = L.rope_tables(cfg, jnp.arange(tokens.shape[1]))
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    k_scales, v_scales = [], []
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        x, ka, va = _block_kv_amax(cfg, lp, x, cos, sin,
                                   cfg.layer_window(li))
        if bits == 4:
            k_scales.append(tuple(
                max(float(a) * margin / qmax, 1e-6) for a in np.asarray(ka)))
            v_scales.append(tuple(
                max(float(a) * margin / qmax, 1e-6) for a in np.asarray(va)))
        else:
            k_scales.append(max(float(ka.max()) * margin / qmax, 1e-6))
            v_scales.append(max(float(va.max()) * margin / qmax, 1e-6))
    return tuple(k_scales), tuple(v_scales)


def dequantized_params(model: PackedLlama, dtype=jnp.bfloat16) -> L.Params:
    """Dense param pytree from a packed model (debug / parity checks)."""
    layers = []
    for lp in model.layers:
        out = {}
        for name, w in lp.items():
            out[name] = dequantize_dense(w, dtype) if isinstance(w, PackedLinear) else w
        layers.append(out)
    return {
        "embed_tokens": model.embed_tokens,
        "layers": layers,
        "norm": model.norm,
        "lm_head": (dequantize_dense(model.lm_head, dtype)
                    if isinstance(model.lm_head, PackedLinear) else model.lm_head),
    }
