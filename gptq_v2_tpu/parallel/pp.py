"""Pipeline-parallel W4A16 serving over a mesh ``stage`` axis (optionally
composed with tensor parallelism over ``model``).

GPipe-style layer pipelining: the decoder's blocks split into ``pp``
contiguous stages (one mesh row along ``stage``), the serving batch
splits into ``pp`` microbatches, and one jitted step rotates the
microbatches through the stages with ``jax.lax.ppermute`` — each device
runs only its own layers, holds only its layers' INT4 weights and KV-cache
slice, and hidden states (a few KB at decode) are the only inter-stage
traffic.  This is the low-bandwidth scale-out complement to tensor
parallelism (``parallel/tp.py``): TP pays per-block all-gathers of
activations and must ride ICI; PP sends one microbatch boundary per stage
per step and tolerates DCN-class links, and it divides *weight + KV
memory* by ``pp`` (a 70B INT4 model does not fit one v5e's 16 GB HBM).

**TPxPP composition** (``make_pp_mesh(pp, tp)``): a ``('stage', 'model')``
mesh — the canonical multi-host layout: PP across hosts (one hidden-state
send per stage per microbatch rides DCN), TP within a host (per-block
collectives ride ICI).  Weights shard over both axes (stage x Megatron
column/row shards); the KV cache shards layers over ``stage`` and heads
over ``model``.

The reference has no distributed code at all; its only pipeline analogue
is the *temporal* block-by-block schedule with CPU offload (reference
``llama.py:89-202``; SURVEY.md §2 #24).  This is the spatial version the
TPU north star mandates.

Schedule: each call processes one decode token (or one prefill) for every
microbatch in ``2*pp - 1`` ticks (fill + steady + drain).  The fill/drain
bubble is ``(pp-1)/(2pp-1)`` of the call; inactive (bubble) ticks steer
their KV writes to the cache's trash position (``max_len - 1``) — the same
steering invariant the prefill pad path uses (``serving/decode.py``):
a position is only ever attended after a real write lands on it.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
from gptq_v2_tpu.parallel.mesh import MODEL_AXIS
from gptq_v2_tpu.parallel.tp import (
    COLUMN_PARALLEL,
    ROW_PARALLEL,
    TPPacked,
    _gather_cols,
    _is_expert,
    _stack_packed,
    make_ep_moe_fn,
    split_packed_column,
    split_packed_row,
)
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import _linear as _plain_linear

STAGE_AXIS = "stage"


def make_pp_mesh(pp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """A ``('stage',)`` mesh of ``pp`` devices, or a ``('stage', 'model')``
    mesh of ``pp x tp`` when ``tp > 1`` (TP innermost → ICI-adjacent)."""
    if devices is None:
        devices = jax.devices()
    if pp is None:
        pp = len(devices) // tp
    n = pp * tp
    assert n <= len(devices), (pp, tp, len(devices))
    if tp == 1:
        return Mesh(np.asarray(devices[:n]), (STAGE_AXIS,))
    grid = np.asarray(devices[:n]).reshape(pp, tp)
    return Mesh(grid, (STAGE_AXIS, MODEL_AXIS))


def pp_size(mesh: Mesh) -> int:
    return mesh.shape[STAGE_AXIS]


def tp_of(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PPPackedLlama:
    """Per-stage packed weights: ``layers[j]`` holds *local layer j of every
    stage* stacked on a leading ``(pp,)`` axis — plus a ``(tp,)`` axis under
    TPxPP — so inside ``shard_map`` each device squeezes its block into the
    params of global layer ``s * layers_per_stage + j`` (its TP shard of
    them, when composed).  Embeddings, final norm, and lm_head are
    replicated (stage 0 consumes the embedding, the last stage the head;
    replication costs little and keeps specs simple)."""

    cfg: L.LlamaConfig  # static
    pp: int  # static
    tp: int  # static
    embed_tokens: Any
    layers: Tuple[Dict[str, Any], ...]  # length = layers_per_stage
    norm: Any
    lm_head: Any

    def tree_flatten(self):
        return ((self.embed_tokens, self.layers, self.norm, self.lm_head),
                (self.cfg, self.pp, self.tp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], *children)

    @property
    def layers_per_stage(self) -> int:
        return len(self.layers)

    def specs(self) -> "PPPackedLlama":
        def leaf_spec(name, w):
            if isinstance(w, TPPacked):
                axes = ((STAGE_AXIS, MODEL_AXIS) if w.lead == 2
                        else (STAGE_AXIS,))
                return w.spec_like(*axes)
            if self.tp > 1 and _is_tp_sharded(name):
                return P(STAGE_AXIS, MODEL_AXIS)
            return P(STAGE_AXIS)  # per-layer norm / replicated-on-model bias
        layer_specs = tuple(
            {k: leaf_spec(k, v) for k, v in lp.items()} for lp in self.layers)
        if isinstance(self.lm_head, PackedLinear):
            lm_spec = PackedLinear(
                P(), P(), P(), None if self.lm_head.perm is None else P(),
                self.lm_head.group_size, self.lm_head.in_features,
                self.lm_head.bits)
        else:
            lm_spec = P()
        return PPPackedLlama(self.cfg, self.pp, self.tp, P(), layer_specs,
                             P(), lm_spec)


def _is_tp_sharded(name: str) -> bool:
    """Layer entries that carry a TP-shard axis under composition: the
    column/row linears, column-parallel biases (row-parallel biases add
    post-psum and stay replicated over ``model``), expert-parallel expert
    weights AND their per-expert biases (whole experts per device; the
    router is replicated), and GPT-OSS sinks (per query head)."""
    if _is_expert(name):  # incl. per-expert biases (GPT-OSS)
        return True
    if name == "self_attn.sinks":
        return True
    if name.endswith(".bias"):
        return name[:-5] in COLUMN_PARALLEL
    return name in COLUMN_PARALLEL or name in ROW_PARALLEL


def _stage_periodic(cfg: L.LlamaConfig, l_loc: int, j: int, fn, what: str):
    """The per-layer property ``fn(layer_idx)`` of local layer ``j`` — must
    be identical on every stage (true for uniform models and alternating
    patterns when ``layers_per_stage`` matches the pattern period), because
    PP stacks local layer ``j`` of every stage into ONE program."""
    vals = {fn(s * l_loc + j) for s in range(cfg.num_hidden_layers // l_loc)}
    assert len(vals) == 1, (
        f"per-layer {what} is not stage-periodic (local layer {j}: {vals});"
        " choose a stage count whose layers_per_stage matches the pattern")
    return vals.pop()


def _stage_window(cfg: L.LlamaConfig, l_loc: int, j: int) -> Optional[int]:
    """Sliding window of local layer ``j`` (stage-periodic)."""
    return _stage_periodic(cfg, l_loc, j, cfg.layer_window, "windows")


def _stage_rope(cfg: L.LlamaConfig, l_loc: int, j: int) -> int:
    """Rope-table index of local layer ``j`` (Gemma-3 local/global rope,
    SmolLM3 NoPE layers) — stage-periodic."""
    return _stage_periodic(cfg, l_loc, j, cfg.layer_rope, "rope selection")


def _stage_chunk(cfg: L.LlamaConfig, l_loc: int, j: int) -> Optional[int]:
    """Llama-4 chunked-attention size of local layer ``j`` (stage-periodic)."""
    return _stage_periodic(cfg, l_loc, j, cfg.layer_chunk, "chunk size")


def _stage_qk_l2(cfg: L.LlamaConfig, l_loc: int, j: int) -> bool:
    """Llama-4 rope-layer QK L2 norm of local layer ``j`` (stage-periodic)."""
    return _stage_periodic(cfg, l_loc, j, cfg.layer_qk_l2, "QK L2 norm")


def _stage_temp_tuned(cfg: L.LlamaConfig, l_loc: int, j: int) -> bool:
    """Whether local layer ``j`` applies the Llama-4 NoPE attention
    temperature (stage-periodic)."""
    return _stage_periodic(
        cfg, l_loc, j,
        lambda li: bool(cfg.attn_temp_tuning and cfg.nope_layers
                        and li in cfg.nope_layers), "temperature tuning")


def _tp_split_layer(cfg, lp: Dict[str, Any], tp: int) -> list:
    """Megatron split of one layer into ``tp`` shard dicts (mirrors
    ``tp.shard_packed_llama``'s per-name rules, unstacked).  MoE experts are
    expert-parallel: shard ``d`` gets whole experts ``[d*E/tp, (d+1)*E/tp)``
    renamed to local slot indices; the router is replicated."""
    shards = [dict() for _ in range(tp)]
    for name, w in lp.items():
        if _is_expert(name):
            continue  # regrouped below
        if name in COLUMN_PARALLEL and isinstance(w, PackedLinear):
            parts = split_packed_column(w, tp)
        elif name in ROW_PARALLEL and isinstance(w, PackedLinear):
            parts = split_packed_row(w, tp)
        elif name in COLUMN_PARALLEL:
            parts = np.split(np.asarray(w), tp, axis=1)
        elif name in ROW_PARALLEL:
            parts = np.split(np.asarray(w), tp, axis=0)
        elif name.endswith(".bias") and name[:-5] in COLUMN_PARALLEL:
            parts = np.split(np.asarray(w), tp, axis=0)
        elif name == "self_attn.sinks":  # GPT-OSS: per query head
            parts = np.split(np.asarray(w), tp, axis=0)
        else:
            parts = [w] * tp  # norms, router, row-parallel bias: replicated
        for s, part in zip(shards, parts):
            s[name] = part
    if cfg.moe_num_experts and any(_is_expert(k) for k in lp):
        assert cfg.moe_num_experts % tp == 0, (cfg.moe_num_experts, tp)
        e_loc = cfg.moe_num_experts // tp
        for d, s in enumerate(shards):
            for j in range(e_loc):
                for proj in ("gate_proj", "up_proj", "down_proj"):
                    for suffix in ("", ".bias"):
                        src = f"mlp.experts.{d * e_loc + j}.{proj}{suffix}"
                        if src in lp:  # biases: GPT-OSS only
                            s[f"mlp.experts.{j}.{proj}{suffix}"] = lp[src]
    return shards


def shard_packed_llama_pp(model, mesh: Mesh) -> PPPackedLlama:
    """Split a :class:`~gptq_v2_tpu.serving.model.PackedLlama`'s layers into
    ``pp`` contiguous stages (x ``tp`` Megatron shards under composition)
    and place every stack on its mesh devices."""
    cfg = model.cfg
    pp, tp = pp_size(mesh), tp_of(mesh)
    n = cfg.num_hidden_layers
    assert n % pp == 0, f"{n} layers not divisible by {pp} stages"
    # MLA (DeepSeek) rides PP unchanged: block_core builds q/k/v from the
    # latent projections internally and the PP attn_fn is generic over the
    # resulting (q, k, padded-v) heads; the cache head dim is cfg.head_dim_
    # (= qk_nope + qk_rope) everywhere.  TPxPP reuses the pure-TP split
    # (tp._tp_split_layer): q_b/kv_b column-parallel by whole heads, the
    # small latent projections (q_a/kv_a) replicated, o row-parallel —
    # within each stage, exactly as the single-stage TP engine.
    assert tp == 1 or not cfg.qk_norm_flat, (
        "OLMo-2 flat QK-norm under TPxPP needs column-sharded norm weights"
        " (parallel/tp.py handles pure TP); use PP-only or TP-only meshes")
    if tp > 1:
        assert cfg.num_attention_heads % tp == 0
        assert cfg.num_key_value_heads % tp == 0
    l_loc = n // pp

    def stack(ws):
        if isinstance(ws[0], (PackedLinear, TPPacked)):
            return _stack_packed(ws)
        return jnp.stack([jnp.asarray(w) for w in ws])

    def prep(lp):
        """One global layer → {name: TPPacked(lead=1) | (tp, ...) | leaf}."""
        from gptq_v2_tpu.serving.model import fuse_layer_dict

        if tp == 1:
            # per-stage fused qkv/gate_up (one gather + one kernel call)
            return dict(lp) if cfg.mla else fuse_layer_dict(dict(lp))
        shards = _tp_split_layer(cfg, lp, tp)
        if not cfg.mla:  # fuse each device's local column shards
            shards = [fuse_layer_dict(s) for s in shards]
        out = {}
        for name in shards[0]:  # expert names are local slots under EP
            parts = [s[name] for s in shards]
            if isinstance(parts[0], PackedLinear):
                out[name] = _stack_packed(parts)
            elif _is_tp_sharded(name):
                out[name] = jnp.stack([jnp.asarray(p) for p in parts])
            else:
                out[name] = parts[0]  # replicated over model
        return out

    prepped = [prep(lp) for lp in model.layers]
    layers = []
    for j in range(l_loc):
        per_stage = [prepped[s * l_loc + j] for s in range(pp)]
        keysets = {frozenset(lp.keys()) for lp in per_stage}
        assert len(keysets) == 1, (
            f"layer parameter sets are not stage-periodic (local layer {j}):"
            " interleaved dense/MoE patterns must repeat with period"
            " layers_per_stage")
        names = per_stage[0].keys()
        layers.append({k: stack([lp[k] for lp in per_stage]) for k in names})
    ppm = PPPackedLlama(cfg, pp, tp, model.embed_tokens, tuple(layers),
                        model.norm, model.lm_head)
    specs = ppm.specs()
    return jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), ppm, specs)


def pp_cache_pspec(cache, tp: int = 1):
    """Cache PartitionSpec: layers shard over ``stage``; KV heads over
    ``model`` under TPxPP.  The spec pytree mirrors the cache's static
    scale aux (int8 storage) so treedefs match."""
    assert isinstance(cache, kvc.ContiguousKVCache), \
        "PP serving uses the contiguous KV cache"
    m = MODEL_AXIS if tp > 1 else None
    s = P(STAGE_AXIS, None, None, m)
    return kvc.ContiguousKVCache(s, s, cache.k_scales, cache.v_scales,
                                 cache.kv_bits)


def shard_cache_pp(cache, mesh: Mesh):
    spec = pp_cache_pspec(cache, tp_of(mesh))
    return jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), cache, spec)


def _local_layer(lp_stacked: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """Squeeze each entry's lead mesh axes into device-local params."""
    out = {}
    for k, v in lp_stacked.items():
        if isinstance(v, TPPacked):
            out[k] = v.local()
        elif tp > 1 and _is_tp_sharded(k):
            out[k] = v[0][0]
        else:
            out[k] = v[0]
    return out


def _make_lin(lp: Dict[str, Any], tp: int):
    """The linear-application strategy for ``block_core`` on a device-local
    PP(+TP) layer: column-parallel runs on the (replicated-over-model)
    input; row-parallel all-gathers the locally sharded activation over
    ``model`` and psums the partial output."""

    def apply(w, h):
        return w4a16_matmul(h, w) if isinstance(w, PackedLinear) else h @ w

    def lin(name: str, h: jax.Array) -> jax.Array:
        w = lp[name]
        b = lp.get(name + ".bias")
        if tp > 1 and name in ROW_PARALLEL:
            hf = _gather_cols(h)
            if not isinstance(w, PackedLinear):
                # dense row shard contracts its own slice of the gathered
                # activation (packed shards select theirs via their perm)
                c_loc = w.shape[0]
                idx = jax.lax.axis_index(MODEL_AXIS)
                hf = jax.lax.dynamic_slice_in_dim(hf, idx * c_loc, c_loc, -1)
            y = jax.lax.psum(apply(w, hf), MODEL_AXIS)
        else:
            y = apply(w, h)
        return y if b is None else y + b

    return lin


def _pp_moe_fn(cfg, tp: int, lp):
    """MoE strategy for a device-local PP(+TP) layer: with ``tp == 1`` the
    layer holds every expert and ``block_core`` falls back to
    ``moe_apply_dense``; under TPxPP experts are expert-parallel over
    ``model`` (local slot names, see ``tp.make_ep_moe_fn``)."""
    if tp == 1 or not cfg.moe_num_experts:
        return None
    return make_ep_moe_fn(
        cfg, tp, lp,
        apply=lambda w, h: (w4a16_matmul(h, w)
                            if isinstance(w, PackedLinear) else h @ w))


def _local_scales(scales, s_idx, l_loc):
    """Per-local-layer int8 scales: slice the static per-global-layer tuple
    (a baked constant array) at this stage's offset.  Returns an (L_loc,)
    traced vector or None."""
    if scales is None:
        return None
    arr = jnp.asarray(scales, jnp.float32)
    return jax.lax.dynamic_slice(arr, (s_idx * l_loc,), (l_loc,))


def _store_kv(arr, j, rows_b, pos_b, val, scale_j):
    """Write K or V rows, quantizing for int8 storage."""
    if arr.dtype == jnp.int8:
        val = jnp.clip(jnp.round(val.astype(jnp.float32) / scale_j),
                       -127, 127)
    return arr.at[j, rows_b, pos_b].set(val.astype(arr.dtype))


def _apply_local_layers(cfg, model: PPPackedLlama, x, ropes, cache_kv,
                        rows, wpos, key_masks, s_len, ks_loc=None,
                        vs_loc=None, q_scales=None):
    """Run this stage's layers on one microbatch, updating the local cache.

    ``cache_kv = (k, v)`` local arrays ``(L_loc, n_slots, max_len, kv_loc,
    hd)``; ``rows`` (mb,) the microbatch's cache rows; ``wpos`` (mb,) write
    positions (trash-steered when the tick is inactive); ``key_masks[j]``
    the valid-key mask of local layer ``j`` (incl. window/chunk masking);
    ``ks_loc/vs_loc`` (L_loc,) per-local-layer int8 scales (None = full
    precision); ``q_scales[j]`` the (mb, 1) Llama-4 temperature factor of
    local layer ``j`` or None.  Returns ``(x, cache_kv)``."""
    ck, cv = cache_kv
    l_loc = model.layers_per_stage
    n = x.shape[1]
    for j in range(l_loc):
        cos, sin = ropes[_stage_rope(cfg, l_loc, j)]
        lp = _local_layer(model.layers[j], model.tp)

        def attn_fn(q, k, v, j=j, lp=lp):
            nonlocal ck, cv
            # write this token's K/V at (rows, wpos), then attend the
            # microbatch's rows over the first s_len positions
            pos_b = jnp.broadcast_to(wpos[:, None], (wpos.shape[0], n))
            rows_b = jnp.broadcast_to(rows[:, None], pos_b.shape)
            ks_j = None if ks_loc is None else ks_loc[j]
            vs_j = None if vs_loc is None else vs_loc[j]
            ck = _store_kv(ck, j, rows_b, pos_b, k, ks_j)
            cv = _store_kv(cv, j, rows_b, pos_b, v, vs_j)
            k_all = jnp.take(ck[j], rows, axis=0)[:, :s_len]
            v_all = jnp.take(cv[j], rows, axis=0)[:, :s_len]
            qq = q
            if ck.dtype == jnp.int8:  # fold k-scale into q (serving.decode)
                qq = q * ks_j.astype(q.dtype)
            attn = L.attention(qq, k_all.astype(q.dtype),
                               v_all.astype(q.dtype), causal_offset=None,
                               key_mask=key_masks[j],
                               sm_scale=cfg.sm_scale_,
                               sinks=lp.get("self_attn.sinks"),
                               q_scale=(None if q_scales is None
                                        else q_scales[j]),
                               logit_cap=cfg.attn_logit_softcap)
            if cv.dtype == jnp.int8:
                attn = attn * vs_j.astype(attn.dtype)
            return attn, None

        x, _ = L.block_core(cfg, lp, x, cos, sin, _make_lin(lp, model.tp),
                            attn_fn, moe_fn=_pp_moe_fn(cfg, model.tp, lp),
                            qk_l2=_stage_qk_l2(cfg, l_loc, j))
    return x, (ck, cv)


def _pp_decode_local(model: PPPackedLlama, tokens, cache, positions,
                     pp: int, mb: int):
    """Device-local pipelined decode body (call inside shard_map): rotates
    the microbatches through the stages over ``2*pp - 1`` ticks and
    returns ``(logits (B, V) replicated, cache)``.  Shared by
    :func:`build_pp_decode_step` and :func:`build_pp_decode_loop`."""
    cfg = model.cfg
    l_loc = model.layers_per_stage
    s_idx = jax.lax.axis_index(STAGE_AXIS)
    s_len = cache.max_len
    d = cfg.hidden_size
    n_slots = tokens.shape[0]
    # the cache spec shards layers over 'stage' (and heads over 'model'
    # under TPxPP): the local view is (L_loc, n_slots, max_len, ...)
    ck, cv = cache.k, cache.v
    ks_loc = _local_scales(cache.k_scales, s_idx, l_loc)
    vs_loc = _local_scales(cache.v_scales, s_idx, l_loc)

    windows = [_stage_window(cfg, l_loc, j) for j in range(l_loc)]
    chunks = [_stage_chunk(cfg, l_loc, j) for j in range(l_loc)]
    temp_tuned = [_stage_temp_tuned(cfg, l_loc, j) for j in range(l_loc)]
    is_first = s_idx == 0
    is_last = s_idx == pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    x_recv = jnp.zeros((mb, 1, d), model.embed_tokens.dtype)
    out = jnp.zeros((n_slots, model.norm.shape[0]), jnp.float32)
    for t in range(2 * pp - 1):
        mbi = t - s_idx  # which microbatch this stage handles this tick
        active = (mbi >= 0) & (mbi < pp)
        mbi_c = jnp.clip(mbi, 0, pp - 1)
        row0 = mbi_c * mb
        rows = row0 + jnp.arange(mb)
        tok = jax.lax.dynamic_slice(tokens, (row0,), (mb,))
        pos = jax.lax.dynamic_slice(positions, (row0,), (mb,))
        # bubble ticks write to the trash position (re-written before
        # ever attended); real ticks write at the token's position
        wpos = jnp.where(active, pos, s_len - 1)
        ropes = [(c[:, None, :], s_[:, None, :])  # (mb, 1, hd) traced
                 for c, s_ in L.rope_tables(cfg, pos)]
        x_first = L.embed_lookup(cfg, model.embed_tokens, tok)[:, None, :]
        x = jnp.where(is_first, x_first, x_recv)
        base = jnp.arange(s_len)[None, :] <= pos[:, None]
        key_masks = []
        for w, c in zip(windows, chunks):
            m = base
            if w is not None:
                m = m & (jnp.arange(s_len)[None, :] > pos[:, None] - w)
            if c is not None:  # Llama-4: keys in the query's chunk only
                m = m & ((jnp.arange(s_len)[None, :] // c)
                         == (pos[:, None] // c))
            key_masks.append(m)
        qs_t = (L.llama4_q_scale(cfg, pos)[:, None]
                if any(temp_tuned) else None)
        q_scales = [qs_t if tt else None for tt in temp_tuned]
        x, (ck, cv) = _apply_local_layers(
            cfg, model, x, ropes, (ck, cv), rows, wpos, key_masks,
            s_len, ks_loc, vs_loc, q_scales=q_scales)
        # the last stage finishes microbatch mbi: stash its hidden
        h = L.rms_norm(x, model.norm, cfg.rms_norm_eps,
                       cfg.norm_unit_offset)[:, 0]
        contrib = jnp.where(is_last & active, h.astype(jnp.float32), 0.0)
        out = jax.lax.dynamic_update_slice(
            out, contrib + jax.lax.dynamic_slice(out, (row0, 0),
                                                 (mb, out.shape[1])),
            (row0, 0))
        x_recv = jax.lax.ppermute(x, STAGE_AXIS, perm)
    # every stage holds zeros except the last: one psum replicates the
    # final hidden; the (cheap) head runs replicated
    out = jax.lax.psum(out, STAGE_AXIS)
    logits = _plain_linear(model.lm_head,
                           out.astype(model.embed_tokens.dtype))
    logits = L.soft_cap(logits, cfg.final_logit_softcap)
    if cfg.logits_divider is not None:
        logits = logits / cfg.logits_divider
    return logits, cache._replace(k=ck, v=cv)


def build_pp_decode_step(mesh: Mesh, n_slots: int, kv_scales=None):
    """Jitted pipelined decode: one new token for every slot per call.

    Contract: ``step(model, tokens (B,), cache, positions (B,)) ->
    (logits (B, V), cache)`` — the PP analogue of
    ``serving.decode.decode_step`` (contiguous cache, batch == slot order).
    ``B = n_slots`` must divide by the stage count; microbatch ``m`` is the
    slot range ``[m*B/pp, (m+1)*B/pp)``.  ``kv_scales=(k_scales, v_scales)``
    (per-global-layer tuples) enables int8 KV caches — must match the
    cache's static scale aux.
    """
    pp, tp = pp_size(mesh), tp_of(mesh)
    assert n_slots % pp == 0, (n_slots, pp)
    mb = n_slots // pp

    def local_step(model, tokens, cache, positions):
        return _pp_decode_local(model, tokens, cache, positions, pp, mb)

    def sharded(model, tokens, cache, positions):
        # spec built from the live cache so every static aux field
        # (scales, kv_bits) mirrors it exactly — treedefs must match
        cspec = pp_cache_pspec(cache, tp)
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(model.specs(), P(), cspec, P()),
            out_specs=(P(), cspec),
            check_vma=False,
        )(model, tokens, cache, positions)

    return jax.jit(sharded, donate_argnums=(2,))


def build_pp_decode_loop(mesh: Mesh, n_slots: int, kv_scales=None):
    """Jitted PP multi-step decode tick: ``n_steps`` full pipeline
    rotations + per-row sampling under ONE ``lax.fori_loop`` inside the
    shard_map — the pipeline-parallel twin of
    ``serving.decode.decode_sample_loop`` (same contract minus
    ``block_tables``/``s_bucket``, same PRNG chain, token-identical).

    Amortizes the per-token host sync over ``n_steps`` pipeline fills —
    the fill/drain bubble per token is unchanged, but multi-chip PP
    serving stops paying one dispatch RTT per token.  Every slot's
    position advances each iteration (inactive slots write junk K/V at
    their advancing positions — safe by the rewrite-before-attend
    invariant, the same as the single-device multi-step tick; the
    ENGINE's host-side mask keeps their scheduler positions fixed).
    Sampling runs replicated on every stage (identical psum'd logits +
    key)."""
    from gptq_v2_tpu.serving.decode import fori_sample_scaffold

    pp, tp = pp_size(mesh), tp_of(mesh)
    assert n_slots % pp == 0, (n_slots, pp)
    mb = n_slots // pp

    def make_local(n_steps, return_logprobs):
        def local_loop(model, tokens, cache, positions, temperatures, key,
                       top_ks, top_ps, min_ps):
            return fori_sample_scaffold(
                n_steps, tokens, cache, key,
                lambda i, toks, cache: _pp_decode_local(
                    model, toks, cache, positions + i, pp, mb),
                temperatures, top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
                return_logprobs=return_logprobs)
        return local_loop

    def sharded(model, tokens, cache, positions, temperatures, key, n_steps,
                top_ks=None, top_ps=None, min_ps=None,
                return_logprobs=False):
        cspec = pp_cache_pspec(cache, tp)
        return jax.shard_map(
            make_local(n_steps, return_logprobs), mesh=mesh,
            in_specs=(model.specs(), P(), cspec, P(), P(), P(), P(), P(),
                      P()),
            out_specs=(P(), cspec, P()),
            check_vma=False,
        )(model, tokens, cache, positions, temperatures, key, top_ks,
          top_ps, min_ps)

    return jax.jit(sharded, donate_argnums=(2,),
                   static_argnames=("n_steps", "return_logprobs"))


def build_pp_prefill(mesh: Mesh, n_slots: int, kv_scales=None):
    """Jitted pipelined prefill: pads-aware prompt ingestion.

    Contract matches ``serving.decode.prefill`` (contiguous cache):
    ``prefill(model, tokens (B, Lpad), cache, lengths (B,), slot (B,)) ->
    (last-token logits (B, V), cache)`` — ``slot`` maps each prompt row to
    its cache row (None = row order), so the engine can prefill an
    admitted subset of slots.  ``B = n_slots`` here is the per-call prompt
    batch (must divide by the stage count), not the cache's slot count.
    """
    pp, tp = pp_size(mesh), tp_of(mesh)
    assert n_slots % pp == 0, (n_slots, pp)
    mb = n_slots // pp

    def local_step(model: PPPackedLlama, tokens, cache, lengths, slot):
        cfg = model.cfg
        l_loc = model.layers_per_stage
        s_idx = jax.lax.axis_index(STAGE_AXIS)
        s_len = cache.max_len
        b, lpad = tokens.shape
        d = cfg.hidden_size
        ck, cv = cache.k, cache.v  # local view: (L_loc, ...)
        ks_loc = _local_scales(cache.k_scales, s_idx, l_loc)
        vs_loc = _local_scales(cache.v_scales, s_idx, l_loc)

        windows = [_stage_window(cfg, l_loc, j) for j in range(l_loc)]
        chunks = [_stage_chunk(cfg, l_loc, j) for j in range(l_loc)]
        temp_tuned = [_stage_temp_tuned(cfg, l_loc, j) for j in range(l_loc)]
        is_first = s_idx == 0
        is_last = s_idx == pp - 1
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        positions = jnp.arange(lpad)
        ropes = L.rope_tables(cfg, positions)
        qs_prompt = (L.llama4_q_scale(cfg, positions)
                     if any(temp_tuned) else None)

        x_recv = jnp.zeros((mb, lpad, d), model.embed_tokens.dtype)
        out = jnp.zeros((n_slots, model.norm.shape[0]), jnp.float32)
        for t in range(2 * pp - 1):
            mbi = t - s_idx
            active = (mbi >= 0) & (mbi < pp)
            mbi_c = jnp.clip(mbi, 0, pp - 1)
            row0 = mbi_c * mb
            tok = jax.lax.dynamic_slice(tokens, (row0, 0), (mb, lpad))
            lens = jax.lax.dynamic_slice(lengths, (row0,), (mb,))
            rows = jax.lax.dynamic_slice(slot, (row0,), (mb,))  # cache rows
            pos_b = jnp.broadcast_to(positions[None], (mb, lpad))
            # pad tokens and bubble ticks both steer to the trash position
            pad = (pos_b >= lens[:, None]) | ~active
            x_first = L.embed_lookup(cfg, model.embed_tokens, tok)
            x = jnp.where(is_first, x_first, x_recv)

            for j in range(l_loc):
                lp = _local_layer(model.layers[j], tp)

                def attn_fn(q, k, v, j=j, pad=pad, rows=rows, lp=lp):
                    nonlocal ck, cv
                    wp = jnp.where(pad, s_len - 1, pos_b)
                    rows_b = jnp.broadcast_to(rows[:, None], wp.shape)
                    ks_j = None if ks_loc is None else ks_loc[j]
                    vs_j = None if vs_loc is None else vs_loc[j]
                    ck = _store_kv(ck, j, rows_b, wp, k, ks_j)
                    cv = _store_kv(cv, j, rows_b, wp, v, vs_j)
                    # prompt attention runs on the fresh full-precision K/V
                    attn = L.attention(q, k, v, window=windows[j],
                                       sm_scale=cfg.sm_scale_,
                                       sinks=lp.get("self_attn.sinks"),
                                       chunk=chunks[j],
                                       q_scale=(qs_prompt if temp_tuned[j]
                                                else None),
                                       logit_cap=cfg.attn_logit_softcap)
                    return attn, None

                cos, sin = ropes[_stage_rope(cfg, l_loc, j)]
                x, _ = L.block_core(cfg, lp, x, cos, sin, _make_lin(lp, tp),
                                    attn_fn, moe_fn=_pp_moe_fn(cfg, tp, lp),
                                    qk_l2=_stage_qk_l2(cfg, l_loc, j))

            h = L.rms_norm(x, model.norm, cfg.rms_norm_eps,
                           cfg.norm_unit_offset)
            last = jnp.take_along_axis(
                h, (lens - 1)[:, None, None], axis=1)[:, 0]
            contrib = jnp.where(is_last & active,
                                last.astype(jnp.float32), 0.0)
            out = jax.lax.dynamic_update_slice(
                out, contrib + jax.lax.dynamic_slice(out, (row0, 0),
                                                     (mb, out.shape[1])),
                (row0, 0))
            x_recv = jax.lax.ppermute(x, STAGE_AXIS, perm)
        out = jax.lax.psum(out, STAGE_AXIS)
        logits = _plain_linear(model.lm_head,
                               out.astype(model.embed_tokens.dtype))
        logits = L.soft_cap(logits, cfg.final_logit_softcap)
        if cfg.logits_divider is not None:
            logits = logits / cfg.logits_divider
        return logits, cache._replace(k=ck, v=cv)

    def sharded(model, tokens, cache, lengths, slot=None):
        if slot is None:
            slot = jnp.arange(tokens.shape[0], dtype=jnp.int32)
        # spec built from the live cache so static aux mirrors it exactly
        cspec = pp_cache_pspec(cache, tp)
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(model.specs(), P(), cspec, P(), P()),
            out_specs=(P(), cspec),
            check_vma=False,
        )(model, tokens, cache, lengths, slot.astype(jnp.int32))

    return jax.jit(sharded, donate_argnums=(2,))
