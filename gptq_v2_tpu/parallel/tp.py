"""Tensor-parallel W4A16 Llama over the mesh ``model`` axis.

Megatron-style sharding, built with ``shard_map`` so the fused W4A16
Pallas kernel runs per-device on its local INT4 shard (GSPMD cannot
partition a ``pallas_call``; manual SPMD is the idiomatic TPU path):

* ``q/k/v/gate/up``: **column-parallel** — output features sharded, full
  contraction, activations replicated on entry.  Attention heads stay
  aligned: each device owns ``hq/tp`` query and ``hkv/tp`` KV heads.
* ``o/down``: **row-parallel** — stored (act-order) contraction columns
  sharded in whole quantization groups; partial outputs ``psum`` over
  ``model``.  Because act-order permutations mix original columns across
  shards, the input activation is all-gathered first and each shard's
  ``perm`` selects its slice — at decode the gathered activation is a few
  KB while the weights it saves re-reading are hundreds of MB.
* KV cache: sharded over the KV-head axis; paged writes/gathers are local.
* embeddings / norms / lm_head: replicated (the reference never quantizes
  them, reference ``llama.py:146-161`` quantizes only block linears).

The reference has no distributed code at all (SURVEY.md §2 #22-27); this
is the scale-out layer the north star mandates.
"""
from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.ops.packing import (
    PackedLinear,
    split_packed_column,
    split_packed_row,
)
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
from gptq_v2_tpu.serving.model import _linear as _plain_linear
from gptq_v2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, tp_size
from gptq_v2_tpu.serving import kv_cache as kvc

COLUMN_PARALLEL = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                   "mlp.gate_proj", "mlp.up_proj",
                   "mlp.shared_experts.gate_proj",
                   "mlp.shared_experts.up_proj",
                   # MLA: the per-head halves shard by whole heads; the
                   # small latent projections (q_a, kv_a) replicate
                   "self_attn.q_b_proj", "self_attn.kv_b_proj",
                   # per-shard FUSED stages (built by _fuse_column_stages /
                   # fuse_layer_dict AFTER splitting — never split directly)
                   "self_attn.qkv_proj", "mlp.gate_up_proj")
ROW_PARALLEL = ("self_attn.o_proj", "mlp.down_proj",
                "mlp.shared_experts.down_proj")

_EXPERT_RE = re.compile(
    r"mlp\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)(\.bias)?$")


def _is_expert(name: str) -> bool:
    return _EXPERT_RE.match(name) is not None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TPPacked:
    """Per-shard packed weights stacked on ``lead`` leading mesh axes.

    The plain TP layout stacks shards on one ``(tp,)`` axis sharded
    ``P('model')``; TPxPP composition (``parallel/pp.py``) stacks on
    ``(pp, tp)`` sharded ``P('stage', 'model')`` with ``lead=2``.  Inside
    ``shard_map`` each device sees its ``(1, ..., 1, ...)`` block and
    :meth:`local` squeezes the lead axes into a :class:`PackedLinear`.
    """

    qweight: Any  # (*lead, C8_loc, R_loc) int32
    scales: Any  # (*lead, G_loc, R_loc)
    zeros: Any  # (*lead, G_loc, R_loc)
    perm: Optional[Any]  # (*lead, C_stored_loc) int32 or None
    group_size: int
    in_features: int
    bits: int = 4
    lead: int = 1

    def tree_flatten(self):
        return ((self.qweight, self.scales, self.zeros, self.perm),
                (self.group_size, self.in_features, self.bits, self.lead))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def local(self) -> PackedLinear:
        """The device-local shard (call inside shard_map)."""

        def sq(a):
            for _ in range(self.lead):
                a = a[0]
            return a

        return PackedLinear(
            qweight=sq(self.qweight),
            scales=sq(self.scales),
            zeros=sq(self.zeros),
            perm=None if self.perm is None else sq(self.perm),
            group_size=self.group_size,
            in_features=self.in_features,
            bits=self.bits,
        )

    def spec_like(self, *axes: str) -> "TPPacked":
        axes = axes or (MODEL_AXIS,)
        s = P(*axes)
        return TPPacked(s, s, s, None if self.perm is None else s,
                        self.group_size, self.in_features, self.bits,
                        len(axes))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TPPackedLlama:
    cfg: L.LlamaConfig  # static
    tp: int  # static
    embed_tokens: Any  # replicated
    layers: Tuple[Dict[str, Any], ...]  # TPPacked | stacked dense | replicated norm
    norm: Any
    lm_head: Any

    def tree_flatten(self):
        return ((self.embed_tokens, self.layers, self.norm, self.lm_head),
                (self.cfg, self.tp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    def specs(self) -> "TPPackedLlama":
        """PartitionSpec pytree matching this model (for shard_map in_specs)."""
        def leaf_spec(k, w):
            if isinstance(w, TPPacked):
                return w.spec_like()
            if isinstance(w, PackedLinear):  # replicated packed (MLA q_a/kv_a)
                return PackedLinear(
                    P(), P(), P(), None if w.perm is None else P(),
                    w.group_size, w.in_features, w.bits)
            if k == "mlp.router":
                return P()  # replicated: every device routes identically
            if hasattr(w, "ndim") and w.ndim >= 2:  # stacked dense/bias shard
                return P(MODEL_AXIS)
            return P()  # replicated (norms, row-parallel bias)
        layer_specs = tuple(
            {k: leaf_spec(k, v) for k, v in lp.items()} for lp in self.layers
        )
        if isinstance(self.lm_head, PackedLinear):  # replicated packed lm_head
            lm_spec = PackedLinear(
                P(), P(), P(), None if self.lm_head.perm is None else P(),
                self.lm_head.group_size, self.lm_head.in_features,
                self.lm_head.bits)
        else:
            lm_spec = P()
        return TPPackedLlama(self.cfg, self.tp, P(), layer_specs, P(), lm_spec)


def _stack_packed(shards) -> TPPacked:
    """Stack PackedLinear shards (→ lead=1) or TPPacked stacks (→ lead+1)."""
    lead = 1 + (shards[0].lead if isinstance(shards[0], TPPacked) else 0)
    return TPPacked(
        qweight=jnp.stack([s.qweight for s in shards]),
        scales=jnp.stack([s.scales for s in shards]),
        zeros=jnp.stack([s.zeros for s in shards]),
        perm=(None if shards[0].perm is None
              else jnp.stack([s.perm for s in shards])),
        group_size=shards[0].group_size,
        in_features=shards[0].in_features,
        bits=shards[0].bits,
        lead=lead,
    )


def _fuse_column_stages(lp: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """Per-shard stage fusion for the TP shard builder: split q/k/v (and
    gate/up) column-parallel, then concatenate each device's shards into
    one fused :class:`PackedLinear` — the TP twin of
    ``serving.model.fuse_stage_linears`` (one activation gather + one
    kernel dispatch per stage per device).  Pops the fused names from
    ``lp`` and returns the stacked fused entries."""
    from gptq_v2_tpu.serving.model import FUSED_STAGES, _fusable, _fuse_packed

    out: Dict[str, Any] = {}
    for fused_name, names in FUSED_STAGES:
        got = _fusable(lp, names)
        if got is None:
            continue
        ws, biases = got
        shard_parts = [split_packed_column(w, tp) for w in ws]
        fused_shards = []
        for d in range(tp):
            f, _ = _fuse_packed([sp[d] for sp in shard_parts],
                                [None] * len(ws))
            fused_shards.append(f)
        out[fused_name] = _stack_packed(fused_shards)
        if biases[0] is not None:
            bias_shards = [
                jnp.concatenate(
                    [np.split(np.asarray(b), tp, axis=0)[d] for b in biases],
                    axis=0)
                for d in range(tp)]
            out[fused_name + ".bias"] = jnp.stack(bias_shards)
        for n in names:
            lp.pop(n)
            lp.pop(n + ".bias", None)
    return out


def shard_packed_llama(model, mesh) -> TPPackedLlama:
    """Shard a :class:`~gptq_v2_tpu.serving.model.PackedLlama` over the mesh
    ``model`` axis and place every array on its devices."""
    cfg = model.cfg
    tp = tp_size(mesh)
    assert cfg.num_attention_heads % tp == 0, (cfg.num_attention_heads, tp)
    assert cfg.num_key_value_heads % tp == 0, (cfg.num_key_value_heads, tp)
    if cfg.moe_num_experts:
        assert cfg.moe_num_experts % tp == 0, (cfg.moe_num_experts, tp)

    def shard_dense(w, axis):
        parts = np.split(np.asarray(w), tp, axis=axis)
        return jnp.stack([jnp.asarray(p) for p in parts])

    layers = []
    for lp in model.layers:
        lp = dict(lp)
        assert "self_attn.qkv_proj" not in lp and "mlp.gate_up_proj" not in lp, (
            "pass the UNFUSED model to TP sharding; per-shard fusion is"
            " applied here (a pre-fused qkv cannot be column-split on"
            " head boundaries)")
        out: Dict[str, Any] = {}
        if not cfg.mla:
            out.update(_fuse_column_stages(lp, tp))
        for name, w in lp.items():
            if _is_expert(name):
                continue  # regrouped below (expert parallelism)
            if name in COLUMN_PARALLEL:
                out[name] = (_stack_packed(split_packed_column(w, tp))
                             if isinstance(w, PackedLinear) else shard_dense(w, 1))
            elif name in ROW_PARALLEL:
                out[name] = (_stack_packed(split_packed_row(w, tp))
                             if isinstance(w, PackedLinear) else shard_dense(w, 0))
            elif (cfg.qk_norm_flat
                  and name in ("self_attn.q_norm", "self_attn.k_norm")):
                # OLMo-2 flat QK-norm: weights shard with the projection's
                # out features; the norm itself psums squares (see
                # _tp_qk_norm_fn)
                out[name] = shard_dense(w, 0)
            elif name.endswith(".bias") and name[:-5] in COLUMN_PARALLEL:
                out[name] = shard_dense(w, 0)  # shards with the out features
            elif name == "self_attn.sinks":
                # GPT-OSS: one learned sink logit per QUERY head — shards
                # with the column-parallel q heads
                out[name] = shard_dense(w, 0)
            else:
                out[name] = w  # norms + router + row-parallel bias: replicated
        # Expert parallelism: device d owns experts [d*e_loc, (d+1)*e_loc) —
        # whole experts, no intra-expert split, no per-expert all-gather.
        # Local names are slot indices; the combine weights are sliced by
        # axis_index inside make_ep_moe_fn.  Per-expert biases (GPT-OSS)
        # travel with their expert's device.
        if cfg.moe_num_experts:
            e_loc = cfg.moe_num_experts // tp
            for j in range(e_loc):
                for proj in ("gate_proj", "up_proj", "down_proj"):
                    for suffix in ("", ".bias"):
                        src = f"mlp.experts.{{}}.{proj}{suffix}"
                        if src.format(0) not in lp:
                            continue
                        shards = [lp[src.format(d * e_loc + j)]
                                  for d in range(tp)]
                        key = f"mlp.experts.{j}.{proj}{suffix}"
                        out[key] = (_stack_packed(shards)
                                    if isinstance(shards[0], PackedLinear)
                                    else jnp.stack([jnp.asarray(s)
                                                    for s in shards]))
        layers.append(out)
    tpm = TPPackedLlama(cfg, tp, model.embed_tokens, tuple(layers),
                        model.norm, model.lm_head)
    specs = tpm.specs()
    return jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), tpm, specs)


def cache_pspec(cache, data_parallel: bool = False):
    """PartitionSpec pytree for a KV cache: KV heads shard over ``model``.

    With ``data_parallel`` the slot pool additionally shards over ``data``:
    each data-shard owns an independent slot range addressed by *local*
    slot ids / block-table ids (independent serving replicas sharing one
    jitted step).
    """
    d = DATA_AXIS if data_parallel else None
    if isinstance(cache, kvc.ContiguousKVCache):
        s = P(None, d, None, MODEL_AXIS, None)
        # mirror the cache's static aux (scales, kv_bits) so treedefs match
        return kvc.ContiguousKVCache(s, s, cache.k_scales, cache.v_scales,
                                     cache.kv_bits)
    # (n_layers, n_pages, page_size, 2·n_kv, hd): combined KV heads shard over
    # model (pairs stay intact — even counts per shard), pool over data.
    # int4 pages (kv_bits=4): the combined entries are ADJACENT-pair
    # nibble bytes, so a contiguous shard of them is a contiguous run of
    # REAL kv heads — the same split aligns with the q-head column shard
    # when n_kv % (2·tp) == 0.
    s = P(None, d, None, MODEL_AXIS, None)
    return kvc.PagedKVCache(s, cache.page_size, cache.k_scales,
                            cache.v_scales, cache.kv_bits)


def shard_cache(cache, mesh, data_parallel: bool = False):
    spec = cache_pspec(cache, data_parallel)
    return jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), cache, spec)


# ---------------------------------------------------------------------------
# Local (per-device) building blocks, used inside shard_map
# ---------------------------------------------------------------------------


def _col_linear(w, x: jax.Array) -> jax.Array:
    """Column-parallel: replicated x → locally sharded output features.
    A plain (unstacked) :class:`PackedLinear` is a REPLICATED weight (MLA
    q_a / kv_a): every device computes the full, identical output."""
    if isinstance(w, TPPacked):
        return w4a16_matmul(x, w.local())
    if isinstance(w, PackedLinear):
        return w4a16_matmul(x, w)
    return x @ w[0]


# Row-parallel outputs are psum'd in chunks along the output-feature axis
# so the all-reduce of chunk i overlaps the dequant-GEMM of chunk i+1
# under XLA's latency-hiding scheduler (async all-reduce-start/done) —
# SURVEY §7.8's "collectives overlapped with the dequant-GEMM".  Chunks
# stay multiples of the kernel's 128-lane tile; small outputs keep one
# psum (chunking below ~2048 features just adds launch overhead).
ROW_PSUM_CHUNKS = 4


def _row_chunk_bounds(r: int):
    n = min(ROW_PSUM_CHUNKS, r // 2048)
    if n <= 1:
        return [(0, r)]
    step = -(-r // n)
    step = -(-step // 128) * 128  # kernel-tile-aligned chunk edges
    return [(c0, min(c0 + step, r)) for c0 in range(0, r, step)]


def _row_linear(w, x_full: jax.Array) -> jax.Array:
    """Row-parallel: gathered full x → psum'd full output (chunked)."""
    import dataclasses as _dc

    if isinstance(w, TPPacked):
        p = w.local()
        bounds = _row_chunk_bounds(p.out_features)
        if len(bounds) == 1:
            return jax.lax.psum(w4a16_matmul(x_full, p), MODEL_AXIS)
        outs = []
        for c0, c1 in bounds:
            pc = _dc.replace(p, qweight=p.qweight[:, c0:c1],
                             scales=p.scales[:, c0:c1],
                             zeros=p.zeros[:, c0:c1])
            outs.append(jax.lax.psum(w4a16_matmul(x_full, pc), MODEL_AXIS))
        return jnp.concatenate(outs, axis=-1)
    wl = w[0]  # (C_loc, R); no act-order on dense weights
    c_loc = wl.shape[0]
    idx = jax.lax.axis_index(MODEL_AXIS)
    x_loc = jax.lax.dynamic_slice_in_dim(x_full, idx * c_loc, c_loc, axis=-1)
    bounds = _row_chunk_bounds(wl.shape[1])
    if len(bounds) == 1:
        return jax.lax.psum(x_loc @ wl, MODEL_AXIS)
    return jnp.concatenate(
        [jax.lax.psum(x_loc @ wl[:, c0:c1], MODEL_AXIS)
         for c0, c1 in bounds], axis=-1)


def _col_lin(lp, name: str, x: jax.Array) -> jax.Array:
    y = _col_linear(lp[name], x)
    b = lp.get(name + ".bias")
    return y if b is None else y + b[0]  # bias shards with the out features


def _row_lin(lp, name: str, x_full: jax.Array) -> jax.Array:
    y = _row_linear(lp[name], x_full)
    b = lp.get(name + ".bias")
    return y if b is None else y + b  # replicated bias, added post-psum


def _gather_cols(x: jax.Array) -> jax.Array:
    """All-gather the feature axis across the model axis (shard order)."""
    return jax.lax.all_gather(x, MODEL_AXIS, axis=x.ndim - 1, tiled=True)


def _tp_qk_norm_fn(cfg: L.LlamaConfig, tp: int):
    """block_core's ``qk_norm_fn`` for TP: the OLMo-2 flat QK-norm
    normalizes over ALL heads' features, which are column-sharded — the
    mean of squares needs one psum over ``model``; the weight shard
    multiplies locally.  Matches ``models.llama.rms_norm`` numerics
    (fp32 stats; Llama-style weight multiply in model dtype)."""
    if not cfg.qk_norm_flat:
        return None
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset

    def fn(t: jax.Array, w: jax.Array) -> jax.Array:
        w = w[0]  # (1, local) stacked shard -> (local,)
        t32 = t.astype(jnp.float32)
        var = jax.lax.psum(jnp.sum(t32 * t32, axis=-1, keepdims=True),
                           MODEL_AXIS) / (t.shape[-1] * tp)
        normed = t32 * jax.lax.rsqrt(var + eps)
        if uo:
            return (normed * (1.0 + w.astype(jnp.float32))).astype(t.dtype)
        return w * normed.astype(t.dtype)

    return fn


def _tp_lin(lp):
    """The TP linear-application strategy for ``models.llama.block_core``:
    column-parallel projections run on replicated input; row-parallel ones
    (o/down) first all-gather the locally sharded activation, then psum."""

    def lin(name: str, h: jax.Array) -> jax.Array:
        if name in ROW_PARALLEL:
            return _row_lin(lp, name, _gather_cols(h))
        return _col_lin(lp, name, h)

    return lin


def make_ep_moe_fn(cfg: L.LlamaConfig, tp: int, lp, apply=None):
    """Expert-parallel MoE combine for ``block_core``'s ``moe_fn`` hook.

    Each device runs its ``E/tp`` *whole* local experts (masked-dense, as in
    ``models.llama.moe_apply_dense``) on the replicated MLP input and the
    partial weighted outputs ``psum`` over ``model``.  Versus
    Megatron-splitting every expert this reads the same total HBM bytes per
    step but needs ZERO all-gathers in the MLP (each expert's contraction is
    fully local) and one psum instead of one per expert.  The router runs
    replicated (it is a tiny (D, E) bf16 matmul); ``comb`` is identical on
    every device, and each device slices its expert columns by
    ``axis_index``.  ``apply(w, h)`` applies one local weight entry —
    default handles the TPPacked / lead-stacked-dense layout of
    :func:`shard_packed_llama`.  Per-expert biases (GPT-OSS) ride their
    expert's device (lead-stacked dense shards).  With ``cfg.moe_llama4``
    the combine weights are the router SCORES and the Llama-4 semantics
    apply: the expert INPUT is score-scaled and outputs sum unweighted
    (``models.llama.moe_apply_llama4``).  Returns ``None`` for dense
    (non-MoE) configs so call sites can pass the result straight
    through."""
    if not cfg.moe_num_experts:
        return None
    if apply is None:
        apply = _col_linear
    e_loc = cfg.moe_num_experts // tp

    def ep_lin(name: str, h: jax.Array) -> jax.Array:
        y = apply(lp[name], h)
        b = lp.get(name + ".bias")
        if b is None:
            return y
        while b.ndim > 1:  # squeeze the lead mesh axes of the local shard
            b = b[0]
        return y + b

    def moe_fn(h: jax.Array, comb: jax.Array) -> jax.Array:
        idx = jax.lax.axis_index(MODEL_AXIS)
        comb_loc = jax.lax.dynamic_slice_in_dim(comb, idx * e_loc, e_loc,
                                                axis=-1)
        out = None
        for j in range(e_loc):
            ce = comb_loc[..., j:j + 1]
            if cfg.moe_llama4:  # input score-scaled, outputs unweighted
                he = h * ce.astype(h.dtype)
                g = ep_lin(f"mlp.experts.{j}.gate_proj", he)
                u = ep_lin(f"mlp.experts.{j}.up_proj", he)
                d = ep_lin(f"mlp.experts.{j}.down_proj", L.moe_glu(cfg, g, u))
            else:
                mask = (ce > 0).astype(h.dtype)
                he = h * mask
                g = ep_lin(f"mlp.experts.{j}.gate_proj", he)
                u = ep_lin(f"mlp.experts.{j}.up_proj", he)
                # mask the down input too: biased experts (GPT-OSS) emit
                # nonzero values for unrouted zero rows (moe_apply_dense)
                d = ep_lin(f"mlp.experts.{j}.down_proj",
                           L.moe_glu(cfg, g, u) * mask)
                d = ce.astype(d.dtype) * d
            out = d if out is None else out + d
        return jax.lax.psum(out, MODEL_AXIS)

    return moe_fn


def _local_sinks(lp):
    """GPT-OSS sinks: the local q heads' shard (inside shard_map the
    stacked (1, hq_loc) view squeezes to (hq_loc,))."""
    s = lp.get("self_attn.sinks")
    if s is None:
        return None
    while s.ndim > 1:
        s = s[0]
    return s


def _tp_block(cfg, tp, lp, x, cos, sin, kv_override=None,
              window=L.AUTO_WINDOW, chunk=None, q_scale=None,
              qk_l2=None) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One decoder block, device-local view.  Mirrors
    ``serving.model.packed_block_apply`` with TP collectives.

    Returns ``(hidden, (k_local, v_local))`` — the new rope'd K/V for the
    *local* KV heads.
    """
    if window == L.AUTO_WINDOW:
        window = cfg.sliding_window
    sinks = _local_sinks(lp)

    def attn_fn(q, k, v):
        if kv_override is not None:
            k_all, v_all, key_mask = kv_override
            attn = L.attention(q, k_all, v_all, causal_offset=None,
                               key_mask=key_mask, sm_scale=cfg.sm_scale_,
                               sinks=sinks, chunk=chunk, q_scale=q_scale,
                               logit_cap=cfg.attn_logit_softcap)
        else:
            attn = L.attention(q, k, v, window=window,
                               sm_scale=cfg.sm_scale_,
                               sinks=sinks, chunk=chunk, q_scale=q_scale,
                               logit_cap=cfg.attn_logit_softcap)
        return attn, (k, v)

    return L.block_core(cfg, lp, x, cos, sin, _tp_lin(lp), attn_fn,
                        moe_fn=make_ep_moe_fn(cfg, tp, lp),
                        qk_norm_fn=_tp_qk_norm_fn(cfg, tp),
                        qk_l2=qk_l2)


# ---------------------------------------------------------------------------
# Sharded prefill / decode steps
# ---------------------------------------------------------------------------


def _write_then_read_kv(cache, li, k, v, block_tables, positions, pad_mask=None,
                        s=None, kv_offset=None):
    """Device-local KV write (+ sequence read view for contiguous, bounded
    to ``s`` positions when given).

    Mirrors the single-device cache handling in ``serving.decode``; inside
    shard_map the KV-head axis is already local.
    """
    b = k.shape[0]
    if isinstance(cache, kvc.ContiguousKVCache):
        if pad_mask is not None:  # prefill: clamp pad writes
            positions = jnp.where(pad_mask, cache.max_len - 1, positions)
        cache = kvc.write_kv_contiguous(cache, li, k, v, positions)
        if s is None or s >= cache.max_len:
            return cache, (cache.k[li], cache.v[li])
        return cache, (cache.k[li, :, :s], cache.v[li, :, :s])
    cache = kvc.write_kv(cache, li, k, v, block_tables, positions,
                         pad_mask=pad_mask, kv_offset=kv_offset)
    if s is None or s >= block_tables.shape[1] * cache.page_size:
        return cache, kvc.gather_kv(cache, li, block_tables)
    n_pages = -(-s // cache.page_size)
    k_all, v_all = kvc.gather_kv(cache, li, block_tables[:, :n_pages])
    return cache, (k_all[:, :s], v_all[:, :s])


def build_tp_prefill(mesh, cache_template, data_parallel: bool = False):
    """Jitted TP prefill over ``mesh``; same contract as
    ``serving.decode.prefill`` (incl. the ``slot`` arg for contiguous
    caches).  ``cache_template`` fixes the cache layout (instance or
    abstract pytree).  ``data_parallel`` shards the batch + cache slot pool
    over the ``data`` axis with shard-local slot/block-table ids."""
    contiguous = isinstance(cache_template, kvc.ContiguousKVCache)

    def local_step(model: TPPackedLlama, tokens, cache, block_tables, lengths,
                   slot):
        cfg = model.cfg
        b, lpad = tokens.shape
        positions = jnp.arange(lpad)
        ropes = L.rope_tables(cfg, positions)
        x = L.embed_lookup(cfg, model.embed_tokens, tokens)
        pos_b = jnp.broadcast_to(positions[None], (b, lpad))
        pad_mask = pos_b >= lengths[:, None]
        for li, lp in enumerate(model.layers):
            cos, sin = ropes[cfg.layer_rope(li)]
            x, (k, v) = _tp_block(cfg, model.tp, lp, x, cos, sin,
                                  window=cfg.layer_window(li),
                                  chunk=cfg.layer_chunk(li),
                                  q_scale=L.layer_q_scale(cfg, li, positions),
                                  qk_l2=cfg.layer_qk_l2(li))
            if contiguous:
                kq, vq = kvc.quantize_kv_write(cache, li, k, v)
                wpos = jnp.where(pad_mask, cache.max_len - 1, pos_b)
                rows = jnp.broadcast_to(slot[:, None], wpos.shape)
                cache = cache._replace(
                    k=cache.k.at[li, rows, wpos].set(kq),
                    v=cache.v.at[li, rows, wpos].set(vq),
                )
            else:
                cache, _ = _write_then_read_kv(
                    cache, li, k, v, block_tables, pos_b, pad_mask,
                    kv_offset=_kv_write_offset(cfg, model.tp, cache))
        x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
        last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0]
        lgp = L.soft_cap(_plain_linear(model.lm_head, last),
                         cfg.final_logit_softcap)
        if cfg.logits_divider is not None:
            lgp = lgp / cfg.logits_divider
        return lgp, cache

    bsp = P(DATA_AXIS) if data_parallel else P()
    csp = cache_pspec(cache_template, data_parallel)

    def sharded(model, tokens, cache, block_tables, lengths, slot):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(model.specs(), bsp, csp,
                      None if block_tables is None else bsp, bsp,
                      None if slot is None else bsp),
            out_specs=(bsp, csp),
            check_vma=False,
        )(model, tokens, cache, block_tables, lengths, slot)

    return jax.jit(sharded, donate_argnums=(2,))


def _kv_write_offset(cfg, tp: int, cache):
    """The shard's first global kv-head index for per-head int4 scale
    slicing at KV-write time (None when scales are scalar / absent)."""
    if (getattr(cache, "kv_bits", 0) == 4 and cache.k_scales is not None
            and (isinstance(cache.k_scales[0], tuple)
                 or isinstance(cache.v_scales[0], tuple))):
        return jax.lax.axis_index(MODEL_AXIS) * (
            cfg.num_key_value_heads // tp)
    return None


def _fold_paged_scales_local(cfg, tp: int, qq, ks, vs):
    """Per-head int4 KV scales inside the TP shard_map: slice this shard's
    ``n_kv/tp`` entries of the full per-kv-head tuples by ``axis_index``
    and fold them via ``serving.decode.fold_paged_kv_scales`` (k into the
    local q-head groups, v onto the kernel output).  Scalar per-layer
    scales pass straight through to the kernel."""
    from gptq_v2_tpu.serving.decode import fold_paged_kv_scales

    if ks is None or not (isinstance(ks, tuple) or isinstance(vs, tuple)):
        return qq, ks, vs, None
    n_heads = len(ks) if isinstance(ks, tuple) else len(vs)
    if not isinstance(ks, tuple):  # mixed scalar/tuple pair: broadcast
        ks = (float(ks),) * n_heads
    if not isinstance(vs, tuple):
        vs = (float(vs),) * n_heads
    kv_loc = cfg.num_key_value_heads // tp
    off = jax.lax.axis_index(MODEL_AXIS) * kv_loc
    return fold_paged_kv_scales(qq, ks, vs, n_kv_override=kv_loc,
                                kv_offset=off)


def _tp_decode_local(model: TPPackedLlama, tokens, cache, block_tables,
                     positions, s_bucket=None):
    """Device-local single-token TP decode body (call inside shard_map):
    ``(logits (B, V) replicated, cache)``.  Shared by
    :func:`build_tp_decode_step` and :func:`build_tp_decode_loop`."""
    contiguous = isinstance(cache, kvc.ContiguousKVCache)
    cfg = model.cfg
    b = tokens.shape[0]
    ropes = [(c[:, None, :], s_[:, None, :])
             for c, s_ in L.rope_tables(cfg, positions)]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]
    if contiguous:
        s = cache.max_len
    else:
        s = block_tables.shape[1] * cache.page_size
    if s_bucket is not None:
        s = min(s, s_bucket)
    base_mask = jnp.arange(s)[None, :] <= positions[:, None]
    masks = {(None, None): base_mask}
    for li in range(cfg.num_hidden_layers):
        mk = (cfg.layer_window(li), cfg.layer_chunk(li))
        if mk not in masks:
            w, c = mk
            m = base_mask
            if w is not None:
                m = m & (jnp.arange(s)[None, :] > positions[:, None] - w)
            if c is not None:  # Llama-4: keys in the query's chunk only
                m = m & ((jnp.arange(s)[None, :] // c)
                         == (positions[:, None] // c))
            masks[mk] = m
    for li, lp in enumerate(model.layers):
        # write the new token's local-head K/V, then attend over the cache
        win = cfg.layer_window(li)
        key_mask = masks[(win, cfg.layer_chunk(li))]
        qs = L.layer_q_scale(cfg, li, positions)
        q_scale = None if qs is None else qs[:, None]

        def attn_fn(q, k, v, li=li, win=win, key_mask=key_mask,
                    lp=lp, q_scale=q_scale):
            nonlocal cache
            if contiguous:
                cache, (k_all, v_all) = _write_then_read_kv(
                    cache, li, k, v, block_tables, positions[:, None], s=s)
                qq = q
                if cache.k_scales is not None:  # int8 KV (serving.decode)
                    qq = q * jnp.asarray(cache.k_scales[li],
                                         jnp.float32).astype(q.dtype)
                    k_all = k_all.astype(q.dtype)
                    v_all = v_all.astype(q.dtype)
                attn = L.attention(qq, k_all, v_all, causal_offset=None,
                                   key_mask=key_mask,
                                   sm_scale=cfg.sm_scale_,
                                   sinks=_local_sinks(lp),
                                   q_scale=q_scale,
                                   logit_cap=cfg.attn_logit_softcap)
                if cache.v_scales is not None:
                    attn = attn * jnp.asarray(cache.v_scales[li],
                                              attn.dtype)
            else:
                from gptq_v2_tpu.ops.paged_attention import (
                    paged_decode_attention,
                )

                cache = kvc.write_kv(cache, li, k, v, block_tables,
                                     positions[:, None],
                                     kv_offset=_kv_write_offset(
                                         cfg, model.tp, cache))
                n_pages = -(-s // cache.page_size)
                qq = q
                if q_scale is not None:  # Llama-4 NoPE temperature
                    qq = qq * q_scale[..., None, None].astype(qq.dtype)
                chunk = cfg.layer_chunk(li)
                bt = block_tables[:, :n_pages]
                lens = positions + 1
                if chunk is not None:
                    # Llama-4 chunked attention = block-table REBASING
                    # (serving.decode._decode_block): shift each row's
                    # table to its chunk's first page, rebase the length
                    start_pages = ((positions // chunk)
                                   * (chunk // cache.page_size))
                    idx = jnp.clip(jnp.arange(n_pages)[None, :]
                                   + start_pages[:, None], 0,
                                   block_tables.shape[1] - 1)
                    bt = jnp.take_along_axis(block_tables, idx, axis=1)
                    lens = lens - (positions // chunk) * chunk
                # local KV heads stream their own pages in-kernel;
                # local sinks ride the per-q-head column shard; tile
                # override as in serving.decode._decode_block.  Per-head
                # int4 scales: fold this shard's slice outside the kernel
                ks = None if cache.k_scales is None else cache.k_scales[li]
                vs = None if cache.v_scales is None else cache.v_scales[li]
                qq, ks, vs, out_fn = _fold_paged_scales_local(
                    cfg, model.tp, qq, ks, vs)
                attn = paged_decode_attention(
                    qq[:, 0], cache.kv[li], lens, bt,
                    sliding_window=win,
                    sm_scale=cfg.sm_scale_,
                    soft_cap=cfg.attn_logit_softcap,
                    sinks=_local_sinks(lp),
                    k_scale=ks, v_scale=vs,
                    kv_int4=cache.kv_bits == 4,
                    num_kv_pages_per_block=(
                        min(n_pages, 128)
                        if win is None or win >= s else None),
                    num_queries_per_block=(16 if q.shape[0] >= 16
                                           else None),
                    vmem_limit_bytes=100 * 1024 * 1024,
                )[:, None]
                if out_fn is not None:
                    attn = out_fn(attn)
            return attn, None

        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = L.block_core(cfg, lp, x, cos, sin, _tp_lin(lp), attn_fn,
                            moe_fn=make_ep_moe_fn(cfg, model.tp, lp),
                            qk_norm_fn=_tp_qk_norm_fn(cfg, model.tp),
                            qk_l2=cfg.layer_qk_l2(li))
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    lgx = L.soft_cap(_plain_linear(model.lm_head, x[:, 0]),
                     cfg.final_logit_softcap)
    if cfg.logits_divider is not None:
        lgx = lgx / cfg.logits_divider
    return lgx, cache


def build_tp_decode_step(mesh, cache_template, data_parallel: bool = False):
    """Jitted TP single-token decode; same contract as
    ``serving.decode.decode_step``.  Args as in :func:`build_tp_prefill`."""
    bsp = P(DATA_AXIS) if data_parallel else P()
    csp = cache_pspec(cache_template, data_parallel)

    def sharded(model, tokens, cache, block_tables, positions, s_bucket=None):
        return jax.shard_map(
            functools.partial(_tp_decode_local, s_bucket=s_bucket), mesh=mesh,
            in_specs=(model.specs(), bsp, csp,
                      None if block_tables is None else bsp, bsp),
            out_specs=(bsp, csp),
            check_vma=False,
        )(model, tokens, cache, block_tables, positions)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("s_bucket",))


def build_tp_decode_loop(mesh, cache_template):
    """Jitted TP multi-step decode tick: ``n_steps`` fused decode+sample
    steps under ONE ``lax.fori_loop`` dispatch INSIDE the shard_map — the
    tensor-parallel twin of ``serving.decode.decode_sample_loop`` (same
    contract and PRNG chain, token-identical outputs).

    This is what lets multi-chip serving amortize the per-token host sync
    exactly like the single-chip fori tick (round-4 item: the engine's
    multi-step paths used to hard-require ``mesh is None``, so multi-chip
    decode paid one dispatch per token).  Sampling runs replicated inside
    the shard_map: the logits and the PRNG key are identical on every
    device, so every device samples the same token and the loop carry
    stays consistent without any collective."""
    from gptq_v2_tpu.serving.decode import fori_sample_scaffold

    csp = cache_pspec(cache_template)

    def make_local(n_steps, s_bucket, return_logprobs):
        def local_loop(model, tokens, cache, block_tables, positions,
                       temperatures, key, top_ks, top_ps, min_ps):
            return fori_sample_scaffold(
                n_steps, tokens, cache, key,
                lambda i, toks, cache: _tp_decode_local(
                    model, toks, cache, block_tables, positions + i,
                    s_bucket=s_bucket),
                temperatures, top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
                return_logprobs=return_logprobs)
        return local_loop

    def sharded(model, tokens, cache, block_tables, positions, temperatures,
                key, n_steps, s_bucket=None, top_ks=None, top_ps=None,
                min_ps=None, return_logprobs=False):
        return jax.shard_map(
            make_local(n_steps, s_bucket, return_logprobs), mesh=mesh,
            in_specs=(model.specs(), P(), csp,
                      None if block_tables is None else P(), P(), P(), P(),
                      P(), P(), P()),
            out_specs=(P(), csp, P()),
            check_vma=False,
        )(model, tokens, cache, block_tables, positions, temperatures, key,
          top_ks, top_ps, min_ps)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("n_steps", "s_bucket",
                                    "return_logprobs"))


def _tp_ragged_forward(model, tokens, cache, positions, tok_pages, tok_offs,
                       block_tables, kv_lens, cu_q_lens, num_seqs):
    """Device-local TP ragged mixed-batch forward shared by
    :func:`build_tp_ragged_step` and :func:`build_tp_ragged_spec_step` —
    the tensor-parallel twin of ``serving.decode._ragged_forward``.
    Returns the final-norm hidden states ``(T, D)`` and the cache."""
    cfg = model.cfg
    ropes = [(c[:, None, :], s_[:, None, :])
             for c, s_ in L.rope_tables(cfg, positions)]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]

    chunk_any = any(cfg.layer_chunk(li) is not None
                    for li in range(cfg.num_hidden_layers))
    if chunk_any:
        # Llama-4 chunked layers: rebased tables/lengths exactly as
        # serving.decode._ragged_forward (the scheduler guarantees
        # one attn chunk per sequence per tick)
        ac = next(c for c in (cfg.layer_chunk(li)
                              for li in range(cfg.num_hidden_layers))
                  if c is not None)
        starts = ((kv_lens - 1) // ac) * ac
        start_pages = starts // cache.page_size
        mp = block_tables.shape[1]
        idx = jnp.clip(jnp.arange(mp)[None, :] + start_pages[:, None],
                       0, mp - 1)
        bt_chunk = jnp.take_along_axis(block_tables, idx, axis=1)
        kv_lens_chunk = kv_lens - starts

    for li, lp in enumerate(model.layers):

        def attn_fn(q, k, v, li=li, lp=lp):
            from gptq_v2_tpu.ops.paged_attention import (
                paged_ragged_attention,
            )

            nonlocal cache
            cache = kvc.write_kv_flat(cache, li, k[:, 0], v[:, 0],
                                      tok_pages, tok_offs,
                                      kv_offset=_kv_write_offset(
                                          cfg, model.tp, cache))
            qq = q
            qs = L.layer_q_scale(cfg, li, positions)
            if qs is not None:  # Llama-4 NoPE temperature
                qq = qq * qs[:, None, None, None].astype(qq.dtype)
            chunked = cfg.layer_chunk(li) is not None
            ks = None if cache.k_scales is None else cache.k_scales[li]
            vs = None if cache.v_scales is None else cache.v_scales[li]
            qq, ks, vs, out_fn = _fold_paged_scales_local(
                cfg, model.tp, qq, ks, vs)
            attn = paged_ragged_attention(
                qq[:, 0], cache.kv[li],
                kv_lens_chunk if chunked else kv_lens,
                bt_chunk if chunked else block_tables, cu_q_lens,
                num_seqs,
                sliding_window=cfg.layer_window(li),
                sm_scale=cfg.sm_scale_,
                soft_cap=cfg.attn_logit_softcap,
                sinks=_local_sinks(lp),
                k_scale=ks, v_scale=vs,
                kv_int4=cache.kv_bits == 4,
            )[:, None]
            if out_fn is not None:
                attn = out_fn(attn)
            return attn, None

        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = L.block_core(
            cfg, lp, x, cos, sin, _tp_lin(lp), attn_fn,
            moe_fn=make_ep_moe_fn(cfg, model.tp, lp),
            qk_norm_fn=_tp_qk_norm_fn(cfg, model.tp),
            qk_l2=cfg.layer_qk_l2(li))

    return L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                      cfg.norm_unit_offset), cache


def build_tp_ragged_step(mesh):
    """Jitted TP mixed prefill+decode tick — the tensor-parallel variant of
    ``serving.decode.ragged_step`` (vLLM-style chunked prefill): same
    contract, with QKV/gate/up column-parallel, o/down row-parallel, and
    the paged KV pool's combined-head axis sharded over ``model`` so each
    device writes and streams only its own heads."""
    from gptq_v2_tpu.serving.decode import (chosen_logprob, pack_tok_logprob,
                                            sample_per_row)

    def make_local_step(return_logprobs):
        def local_step(model, tokens, cache, positions, tok_pages,
                       tok_offs, block_tables, kv_lens, cu_q_lens, num_seqs,
                       sample_rows, temperatures, key, top_ks, top_ps,
                       min_ps):
            cfg = model.cfg
            x, cache = _tp_ragged_forward(model, tokens, cache, positions,
                                          tok_pages, tok_offs, block_tables,
                                          kv_lens, cu_q_lens, num_seqs)
            last = jnp.take(x, sample_rows, axis=0)
            logits = L.soft_cap(_plain_linear(model.lm_head, last),
                                cfg.final_logit_softcap)
            if cfg.logits_divider is not None:
                logits = logits / cfg.logits_divider
            key, sub = jax.random.split(key)
            toks = sample_per_row(logits, sub, temperatures,
                                  top_ks=top_ks, top_ps=top_ps,
                                  min_ps=min_ps)
            if return_logprobs:
                toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
            return toks, cache, key
        return local_step

    csp = P(None, None, None, MODEL_AXIS, None)

    def sharded(model, tokens, cache, positions, tok_pages, tok_offs,
                block_tables, kv_lens, cu_q_lens, num_seqs, sample_rows,
                temperatures, key, top_ks=None, top_ps=None, min_ps=None,
                return_logprobs=False):
        cache_spec = kvc.PagedKVCache(csp, cache.page_size,
                                      cache.k_scales, cache.v_scales,
                                      cache.kv_bits)
        return jax.shard_map(
            make_local_step(return_logprobs), mesh=mesh,
            in_specs=(model.specs(), P(), cache_spec,
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(), P(), P()),
            out_specs=(P(), cache_spec, P()),
            check_vma=False,
        )(model, tokens, cache, positions, tok_pages, tok_offs, block_tables,
          kv_lens, cu_q_lens, num_seqs, sample_rows, temperatures, key,
          top_ks, top_ps, min_ps)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("return_logprobs",))


def build_tp_ragged_multi(mesh):
    """Jitted TP multi-step DECODE-ONLY ragged tick — the tensor-parallel
    twin of ``serving.decode.ragged_multi_step``: ``n_steps`` ragged
    decode+sample steps under ONE ``lax.fori_loop`` inside the shard_map,
    per-step (page, offset) write targets derived on device, sampling
    replicated (identical logits + key on every device).  Same contract
    as the single-device function."""
    from gptq_v2_tpu.serving.decode import fori_sample_scaffold

    csp = P(None, None, None, MODEL_AXIS, None)

    def make_local(n_steps, return_logprobs):
        def local_loop(model, tokens, cache, positions, block_tables,
                       kv_lens, num_seqs, temperatures, key, top_ks, top_ps,
                       min_ps):
            cfg = model.cfg
            s = tokens.shape[0]
            ps = cache.page_size
            cu = jnp.minimum(jnp.arange(s + 1, dtype=jnp.int32), num_seqs[0])
            sample_rows = jnp.arange(s, dtype=jnp.int32)
            row_active = jnp.arange(s) < num_seqs[0]

            def step_fn(i, toks, cache):
                pos = positions + i
                page_idx = jnp.clip(pos // ps, 0, block_tables.shape[1] - 1)
                pg = jnp.take_along_axis(block_tables, page_idx[:, None],
                                         axis=1)[:, 0]
                pg = jnp.where(row_active, pg, 0)
                of = jnp.where(row_active, pos % ps, 0)
                x, cache = _tp_ragged_forward(model, toks, cache, pos, pg,
                                              of, block_tables, kv_lens + i,
                                              cu, num_seqs)
                last = jnp.take(x, sample_rows, axis=0)
                logits = L.soft_cap(_plain_linear(model.lm_head, last),
                                    cfg.final_logit_softcap)
                if cfg.logits_divider is not None:
                    logits = logits / cfg.logits_divider
                return logits, cache

            return fori_sample_scaffold(
                n_steps, tokens, cache, key, step_fn, temperatures,
                top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
                return_logprobs=return_logprobs)
        return local_loop

    def sharded(model, tokens, cache, positions, block_tables, kv_lens,
                num_seqs, temperatures, key, n_steps, top_ks=None,
                top_ps=None, min_ps=None, return_logprobs=False):
        cache_spec = kvc.PagedKVCache(csp, cache.page_size, cache.k_scales,
                                      cache.v_scales, cache.kv_bits)
        return jax.shard_map(
            make_local(n_steps, return_logprobs), mesh=mesh,
            in_specs=(model.specs(), P(), cache_spec, P(), P(), P(), P(),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), cache_spec, P()),
            check_vma=False,
        )(model, tokens, cache, positions, block_tables, kv_lens, num_seqs,
          temperatures, key, top_ks, top_ps, min_ps)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("n_steps", "return_logprobs"))


def build_tp_ragged_spec_step(mesh):
    """Jitted TP speculative mixed tick — the tensor-parallel variant of
    ``serving.decode.ragged_spec_step``: one ragged dispatch verifies every
    decoding sequence's k+1-token chunk AND streams admitting prompts'
    chunks, with the draft accept/reject fused on device.  The (small,
    single-device) draft's logits/proposals replicate into the shard_map;
    projections are column/row-parallel and the page pool's combined-head
    axis shards over ``model`` exactly as :func:`build_tp_ragged_step`."""
    from gptq_v2_tpu.serving.decode import (chosen_logprob, pack_tok_logprob,
                                            sample_per_row)
    from gptq_v2_tpu.serving.speculative import acceptance_step

    def make_local_step(return_logprobs):
        def local_step(model, tokens, cache, positions, tok_pages, tok_offs,
                       block_tables, kv_lens, cu_q_lens, num_seqs,
                       sample_rows, chunk_rows, seq_slots, d_logits, d_toks,
                       temperatures, key, top_ks, top_ps, min_ps):
            cfg = model.cfg
            s_seq, k1 = chunk_rows.shape
            d_lg = jnp.take(d_logits, seq_slots, axis=0)  # (S, k, V)
            d_tk = jnp.take(d_toks, seq_slots, axis=0)  # (S, k)
            tokens = tokens.at[chunk_rows[:, 1:].reshape(-1)].set(
                d_tk.reshape(-1))
            x, cache = _tp_ragged_forward(model, tokens, cache, positions,
                                          tok_pages, tok_offs, block_tables,
                                          kv_lens, cu_q_lens, num_seqs)
            hc = jnp.take(x, chunk_rows.reshape(-1), axis=0)
            t_logits = L.soft_cap(_plain_linear(model.lm_head, hc),
                                  cfg.final_logit_softcap)
            if cfg.logits_divider is not None:
                t_logits = t_logits / cfg.logits_divider
            t_logits = t_logits.reshape(s_seq, k1, -1)
            key, k_acc, k_first = jax.random.split(key, 3)
            out, counts, _ = acceptance_step(
                t_logits, d_lg, d_tk, k_acc, temperatures, top_ks=top_ks,
                top_ps=top_ps, min_ps=min_ps,
                return_logprobs=return_logprobs)
            first_logits = L.soft_cap(
                _plain_linear(model.lm_head, jnp.take(x, sample_rows, axis=0)),
                cfg.final_logit_softcap)
            if cfg.logits_divider is not None:
                first_logits = first_logits / cfg.logits_divider
            first = sample_per_row(first_logits, k_first, temperatures,
                                   top_ks=top_ks, top_ps=top_ps,
                                   min_ps=min_ps)
            if return_logprobs:
                out, lps = out[..., 0], out[..., 1]
                first_lp = jax.lax.bitcast_convert_type(
                    chosen_logprob(first_logits, first), jnp.int32)
                packed = jnp.concatenate(
                    [first[:, None], counts[:, None], out,
                     first_lp[:, None], lps], axis=1)
            else:
                packed = jnp.concatenate(
                    [first[:, None], counts[:, None], out], axis=1)
            return packed, cache, key
        return local_step

    def sharded(model, tokens, cache, positions, tok_pages, tok_offs,
                block_tables, kv_lens, cu_q_lens, num_seqs, sample_rows,
                chunk_rows, seq_slots, d_logits, d_toks, temperatures, key,
                top_ks=None, top_ps=None, min_ps=None,
                return_logprobs=False):
        csp = P(None, None, None, MODEL_AXIS, None)
        cache_spec = kvc.PagedKVCache(csp, cache.page_size, cache.k_scales,
                                      cache.v_scales, cache.kv_bits)
        return jax.shard_map(
            make_local_step(return_logprobs), mesh=mesh,
            in_specs=(model.specs(), P(), cache_spec,
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), cache_spec, P()),
            check_vma=False,
        )(model, tokens, cache, positions, tok_pages, tok_offs, block_tables,
          kv_lens, cu_q_lens, num_seqs, sample_rows, chunk_rows, seq_slots,
          d_logits, d_toks, temperatures, key, top_ks, top_ps, min_ps)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("return_logprobs",))


def build_tp_verify_chunk(mesh, cache_template):
    """Jitted TP chunk-verification step for speculative decoding — the
    tensor-parallel variant of ``serving.speculative.verify_chunk``: same
    contract (``(model, tokens (B,Q), cache, positions (B,)) -> (logits
    (B,Q,V), cache)``), with projections column/row-parallel, MoE experts
    expert-parallel, and the contiguous KV cache's head axis sharded over
    ``model`` (each device writes and attends only its own heads).  This
    is what lets a multi-chip target (70B INT4 across a mesh) verify a
    draft's proposals in one dispatch."""
    assert isinstance(cache_template, kvc.ContiguousKVCache), \
        "speculative decoding uses the contiguous KV cache"

    def local_step(model: TPPackedLlama, tokens, cache, positions):
        cfg = model.cfg
        b, qn = tokens.shape
        pos_b = positions[:, None] + jnp.arange(qn)[None]
        ropes = [(c.reshape(b, qn, -1), s_.reshape(b, qn, -1))
                 for c, s_ in L.rope_tables(cfg, pos_b.reshape(-1))]
        x = L.embed_lookup(cfg, model.embed_tokens, tokens)
        s = cache.max_len

        for li, lp in enumerate(model.layers):
            win = cfg.layer_window(li)

            def attn_fn(q, k, v, li=li, win=win):
                nonlocal cache
                cache = kvc.write_kv_contiguous(cache, li, k, v, pos_b)
                k_all, v_all = cache.k[li, :, :s], cache.v[li, :, :s]
                qq = q
                if cache.k_scales is not None:
                    qq = q * jnp.asarray(cache.k_scales[li],
                                         jnp.float32).astype(q.dtype)
                    k_all = k_all.astype(q.dtype)
                    v_all = v_all.astype(q.dtype)
                attn = L.attention(qq, k_all, v_all, causal_offset=positions,
                                   window=win, sm_scale=cfg.sm_scale_,
                                   sinks=_local_sinks(lp),
                                   logit_cap=cfg.attn_logit_softcap)
                if cache.v_scales is not None:
                    attn = attn * jnp.asarray(cache.v_scales[li], attn.dtype)
                return attn, None

            cos, sin = ropes[cfg.layer_rope(li)]
            x, _ = L.block_core(cfg, lp, x, cos, sin, _tp_lin(lp), attn_fn,
                                moe_fn=make_ep_moe_fn(cfg, model.tp, lp),
                                qk_norm_fn=_tp_qk_norm_fn(cfg, model.tp))
        x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
        lgx = L.soft_cap(_plain_linear(model.lm_head, x),
                         cfg.final_logit_softcap)
        if cfg.logits_divider is not None:
            lgx = lgx / cfg.logits_divider
        return lgx, cache

    csp = cache_pspec(cache_template)

    def sharded(model, tokens, cache, positions):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(model.specs(), P(), csp, P()),
            out_specs=(P(), csp),
            check_vma=False,
        )(model, tokens, cache, positions)

    return jax.jit(sharded, donate_argnums=(2,))


def build_tp_forward_logits(mesh):
    """Jitted TP full-sequence forward (eval / parity tests)."""

    def local_fwd(model: TPPackedLlama, tokens):
        cfg = model.cfg
        positions = jnp.arange(tokens.shape[1])
        ropes = L.rope_tables(cfg, positions)
        x = L.embed_lookup(cfg, model.embed_tokens, tokens)
        for li, lp in enumerate(model.layers):
            cos, sin = ropes[cfg.layer_rope(li)]
            x, _ = _tp_block(cfg, model.tp, lp, x, cos, sin,
                             window=cfg.layer_window(li),
                             chunk=cfg.layer_chunk(li),
                             q_scale=L.layer_q_scale(cfg, li, positions),
                             qk_l2=cfg.layer_qk_l2(li))
        x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
        lgx = L.soft_cap(_plain_linear(model.lm_head, x),
                         cfg.final_logit_softcap)
        return (lgx if cfg.logits_divider is None
                else lgx / cfg.logits_divider)

    def sharded(model, tokens):
        return jax.shard_map(
            local_fwd, mesh=mesh,
            in_specs=(model.specs(), P()),
            out_specs=P(),
            check_vma=False,
        )(model, tokens)

    return jax.jit(sharded)
