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
    _dedupe_perms(layers)
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


def _dedupe_perms(layers: List[Dict[str, Any]]) -> None:
    """Share one buffer among value-equal act-order perms (in place).

    Stage-mates (q/k/v, gate/up) quantize from a shared Hessian, so their
    act-order argsorts are identical arrays.  Pointing them at ONE buffer
    lets XLA CSE the per-linear activation gathers into one — the gather
    is a lane-shuffle op (~2.2 ms/step at 7B b32 when duplicated per
    linear, the largest non-roofline term in the decode profile)."""
    import dataclasses as _dc

    cache: Dict[bytes, jax.Array] = {}
    for lp in layers:
        for name, w in list(lp.items()):
            if isinstance(w, PackedLinear) and w.perm is not None:
                key = np.asarray(w.perm).tobytes()
                if key in cache:
                    lp[name] = _dc.replace(w, perm=cache[key])
                else:
                    cache[key] = w.perm
        cache.clear()  # share within a layer only (buffers stay small)


FUSED_STAGES = (
    ("self_attn.qkv_proj",
     ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj")),
    ("mlp.gate_up_proj", ("mlp.gate_proj", "mlp.up_proj")),
)


def _fusable(lp, names):
    ws = [lp.get(n) for n in names]
    if not all(isinstance(w, PackedLinear) for w in ws):
        return None
    w0 = ws[0]
    if any(w.group_size != w0.group_size or w.bits != w0.bits
           or w.in_features != w0.in_features
           or w.qweight.shape[0] != w0.qweight.shape[0] for w in ws):
        return None
    perms = [w.perm for w in ws]
    if any((p is None) != (perms[0] is None) for p in perms):
        return None
    if perms[0] is not None:
        p0 = np.asarray(perms[0])
        if any(not np.array_equal(np.asarray(p), p0) for p in perms[1:]):
            return None
    biases = [lp.get(n + ".bias") for n in names]
    if any((b is None) != (biases[0] is None) for b in biases):
        return None
    return ws, biases

def _fuse_packed(ws, biases):
    w0 = ws[0]
    fused = PackedLinear(
        qweight=jnp.concatenate([w.qweight for w in ws], axis=1),
        scales=jnp.concatenate([w.scales for w in ws], axis=1),
        zeros=jnp.concatenate([w.zeros for w in ws], axis=1),
        perm=w0.perm,
        group_size=w0.group_size,
        in_features=w0.in_features,
        bits=w0.bits,
    )
    bias = (None if biases[0] is None
            else jnp.concatenate(list(biases), axis=0))
    return fused, bias


def fuse_layer_dict(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Per-layer stage fusion (see :func:`fuse_stage_linears`): returns a
    new dict with q/k/v and gate/up fused when compatible.  Shared by the
    single-device transform and the TP/PP shard builders (which fuse each
    device's local shard)."""
    lp = dict(lp)
    for fused_name, names in FUSED_STAGES:
        got = _fusable(lp, names)
        if got is None:
            continue
        fused, bias = _fuse_packed(*got)
        for n in names:
            lp.pop(n)
            lp.pop(n + ".bias", None)
        lp[fused_name] = fused
        if bias is not None:
            lp[fused_name + ".bias"] = bias
    return lp


def _permute_out(w, cols):
    """Reorder a linear's OUTPUT columns — a free relabeling of lanes
    (packed columns are independent in the plane-per-group layout)."""
    from gptq_v2_tpu.ops.packing import BitSlicedLinear

    if isinstance(w, BitSlicedLinear):
        return BitSlicedLinear(lo=_permute_out(w.lo, cols),
                               hi=_permute_out(w.hi, cols))
    if isinstance(w, PackedLinear):
        return dataclasses.replace(w, qweight=w.qweight[:, cols],
                                   scales=w.scales[:, cols],
                                   zeros=w.zeros[:, cols])
    return w[:, cols]  # dense (C, R)


def _strip_perm(w):
    from gptq_v2_tpu.ops.packing import BitSlicedLinear

    if isinstance(w, BitSlicedLinear):
        return BitSlicedLinear(lo=dataclasses.replace(w.lo, perm=None),
                               hi=dataclasses.replace(w.hi, perm=None))
    return dataclasses.replace(w, perm=None)


def _down_perm(w):
    from gptq_v2_tpu.ops.packing import BitSlicedLinear

    if isinstance(w, BitSlicedLinear):
        lo, hi = w.lo.perm, w.hi.perm
        if lo is None or hi is None or not np.array_equal(
                np.asarray(lo), np.asarray(hi)):
            return None
        return lo
    if isinstance(w, PackedLinear):
        return w.perm
    return None


def fold_down_perm_layer(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Fold ``mlp.down_proj``'s act-order perm into gate/up OUTPUT columns.

    ``x_down = act(gate(h)) * up(h)`` is elementwise in the intermediate
    columns, so reordering gate's and up's output columns by ``perm`` makes
    the MLP intermediate arrive already in down's stored row order — the
    runtime activation gather (a slow lane-shuffle: the single widest one
    in the 7B decode profile, [B, 11008] per layer per step) disappears
    for zero extra HBM traffic.  Output-column permutation of a packed
    linear is exact: columns are independent lanes of qweight/scales/zeros.

    Single-device/PP transform (the TP row-shard path assigns down's
    stored rows to shards by activation ownership instead)."""
    down = lp.get("mlp.down_proj")
    if down is None:
        return lp
    perm = _down_perm(down)
    if perm is None:
        return lp
    ins = getattr(down, "in_features", None)
    if ins is None or perm.shape[0] != ins:  # TP row shard: partial gather
        return lp
    lp = dict(lp)
    if "mlp.gate_up_proj" in lp:
        gu = lp["mlp.gate_up_proj"]
        outf = (gu.out_features if isinstance(gu, PackedLinear)
                else gu.shape[1] if hasattr(gu, "shape") else None)
        if outf != 2 * ins:
            return lp
        cols = jnp.concatenate([perm, perm + ins])
        lp["mlp.gate_up_proj"] = _permute_out(gu, cols)
        if "mlp.gate_up_proj.bias" in lp:
            lp["mlp.gate_up_proj.bias"] = lp["mlp.gate_up_proj.bias"][cols]
    elif "mlp.gate_proj" in lp and "mlp.up_proj" in lp:
        for n in ("mlp.gate_proj", "mlp.up_proj"):
            w = lp[n]
            outf = (w.out_features if hasattr(w, "out_features")
                    else w.shape[1] if hasattr(w, "shape") else None)
            if outf != ins:
                return lp
        for n in ("mlp.gate_proj", "mlp.up_proj"):
            lp[n] = _permute_out(lp[n], perm)
            if n + ".bias" in lp:
                lp[n + ".bias"] = lp[n + ".bias"][perm]
    else:
        return lp
    lp["mlp.down_proj"] = _strip_perm(down)
    return lp


def fuse_stage_linears(model: "PackedLlama") -> "PackedLlama":
    """Fuse q/k/v → ``self_attn.qkv_proj`` and gate/up →
    ``mlp.gate_up_proj`` when the stage-mates are packed with one shared
    act-order perm (they quantize from a shared stage Hessian, so their
    argsorts are identical) and identical group layouts.

    One fused :class:`PackedLinear` = ONE activation gather + ONE fused
    kernel dispatch per stage instead of three/two — the act-order column
    gather is a slow lane-shuffle op (~2.2 ms/step at 7B b32 when run per
    linear, the largest non-roofline term in the decode profile), and the
    kernel dispatch overhead shrinks too.  Single-device serving only
    (TP column splits slice q|k|v head boundaries — the unfused names
    stay the TP path); a no-op for MLA / MoE / mismatched stages.
    ``block_core`` / ``_mlp_tail`` consume the fused names natively.
    """
    cfg = model.cfg
    if cfg.mla:
        return model


    layers = [fold_down_perm_layer(fuse_layer_dict(lp))
              for lp in model.layers]
    return dataclasses.replace(model, layers=tuple(layers))


def to_w4a8(model: "PackedLlama") -> "PackedLlama":
    """W4A8 serving tier: every block linear's activations quantize
    per-row to dynamic symmetric int8 and the fused kernel runs int8 MXU
    dots (``ops/w4a16.py::_kernel_a8``; v5e int8 MXU measures ~125 vs
    ~89 bf16 T(FL)OP/s same-epoch).  The lm_head stays bf16 (logit
    quality).  Opt-in — ``Engine(act_dtype="int8")``; single-device
    (the TP shard specs assume act_bits=16).

    Honest perf note (v5e, measured): at decode shapes the fused kernel
    is extraction/HBM-bound, not MXU-MAC-bound, so W4A8 ~matches W4A16
    step time on this chip (413.7 vs 424.6 us/matmul at B=320,
    4096x4096 chained) — the tier's value here is the API + the ~0.5-1%
    activation-quant accuracy trade documented by its tests, and 2x MAC
    headroom on parts where the int8 array is the binding unit."""
    def conv(lp):
        out = {}
        for k, v in lp.items():
            out[k] = (dataclasses.replace(v, act_bits=8)
                      if isinstance(v, PackedLinear) else v)
        return out

    return dataclasses.replace(model,
                               layers=tuple(conv(lp) for lp in model.layers))


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
    n_keys = sum(len(sh) + 3 for sh in per_layer) + 2  # +2/layer: stage perms
    keys = iter(jax.random.split(jax.random.key(seed), n_keys))

    def packed(c, r, perm=None):
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
        if act_order and perm is None:
            perm = jax.random.permutation(k4, c).astype(jnp.int32)
        return PackedLinear(
            qweight=qweight,
            scales=scales.astype(compute_dtype),
            zeros=zeros.astype(compute_dtype),
            perm=perm if act_order else None,
            group_size=g, in_features=c,
        )

    def dense(*shape):
        scale = 1.0 / np.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(compute_dtype)

    norm_init = jnp.zeros if cfg.norm_unit_offset else jnp.ones
    # Stage-mates share ONE act-order perm, as in a real GPTQ model (q/k/v
    # and gate/up each quantize from a shared stage Hessian, so their
    # argsorts are identical).  One shared buffer per stage also lets XLA
    # CSE the per-linear activation gathers into one — the act-order
    # gather is a lane-shuffle op (~2.2 ms/step at 7B b32 when duplicated
    # per linear, the largest non-roofline term in the decode profile).
    STAGE_MATES = (("self_attn.q_proj", "self_attn.k_proj",
                    "self_attn.v_proj"), ("mlp.gate_proj", "mlp.up_proj"))
    layers = []
    for shapes in per_layer:
        lp = {}
        shared_perm = {}
        if act_order:
            for mates in STAGE_MATES:
                first = next((m for m in mates if m in shapes), None)
                if first is not None:
                    c = shapes[first][0]
                    pk = jax.random.split(next(keys), 1)[0]
                    p = jax.random.permutation(pk, c).astype(jnp.int32)
                    for m in mates:
                        shared_perm[m] = p
        for name, shape in shapes.items():
            if len(shape) == 1:
                lp[name] = norm_init(shape, compute_dtype)
            elif name in L.NON_QUANTIZED_LINEARS:
                lp[name] = dense(*shape)  # MoE router stays bf16
            else:
                lp[name] = packed(*shape, perm=shared_perm.get(name))
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
