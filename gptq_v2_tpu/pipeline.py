"""Block-sequential, dependency-scheduled GPTQ quantization driver.

TPU-native re-design of the reference's quantization orchestration
(reference: ``llama.py:64-204``).  Key structural differences, same
semantics:

* **No Catcher / RecorderWrapper / replay machinery** (reference
  ``model_utils.py:69-109``, ``llama.py:96-136``): the functional block
  exposes capture points, and "error propagation through already-quantized
  predecessors" (the GPTQ-v2 improvement, ``llama.py:171-179``) falls out
  naturally — each stage's Hessian pass re-runs the block forward with the
  *current* (partially quantized) parameters, so downstream stages see
  quantized predecessors' real outputs.  XLA DCE trims everything after the
  captured activation, so a stage forward costs only its prefix.
* **One compilation per stage shape**, reused across all 32 blocks (the
  reference re-dispatches eagerly per block).
* **Host offload**: full weights stay in host RAM; one layer at a time is
  resident on device (the reference's GPU↔CPU strategy,
  ``llama.py:104-105,194-195``), while activations for all calibration
  sequences stay on device.
* Per-layer quantization results stream to disk as ``.npz`` for resumable
  runs (the reference saves only once at the end, ``main.py:37-38``).

Numerics contract (SURVEY.md §2): fp32 Hessians, ``2/n_seq`` scaling,
act-order, cumulative damp retry, fp16-roundtrip error feedback, quantized
weights cast to model dtype before downstream stages.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu import graph
from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.quant import gptq as gq
from gptq_v2_tpu.quant import hessian as hs

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Algorithm hyper-parameters.

    The reference hard-codes these at call sites (``llama.py:138,146-161``);
    here they are first-class config, enabling the bits × group × act-order
    sweeps the reference only supports through code edits.
    """

    bits: int = 4
    group_size: int = 128
    sym: bool = False
    act_order: bool = True
    damp_ratio: float = 1e-2
    mse: bool = False
    mse_max_shrink: float = 0.8
    mse_n_grid: int = 100
    mse_norm: float = 2.4
    scale_bit_width: Optional[int] = None
    rtn: bool = False  # skip GPTQ error feedback entirely (round-to-nearest)
    feedback_dtype: Optional[str] = "float16"
    use_hessian_kernel: bool = True
    use_solver_kernel: Optional[bool] = None  # None = auto (Pallas on TPU)


import ml_dtypes


class QuantMetaRef:
    """Lazy dequantized view of a quantized linear, stored as host-side
    ``quant_meta`` (uint8 codes + per-group scales — ~4x smaller than the
    dense weight, and the only thing the pipeline ships off-device).

    Mirrors the reference's design where the model retains *reconstructed*
    layers after quantization (reference ``llama.py:172-174,199``,
    ``quant.py:262-279``): evaluation materializes the dequantized weight
    from the saved metadata, on device, on demand.
    """

    def __init__(self, meta: Dict, dtype):
        self.meta = meta
        r, c = meta["qweight"].shape
        self.shape = (c, r)  # (in, out) — model param layout
        self.dtype = jnp.dtype(dtype)
        self.ndim = 2

    def materialize(self) -> jax.Array:
        from gptq_v2_tpu.quant.quantizer import reconstruct_weight

        meta_dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                    for k, v in self.meta.items()}
        w = reconstruct_weight(meta_dev, out_dtype=jnp.float32)  # (R, C)
        return w.T.astype(self.dtype)

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(jax.device_get(self.materialize()))
        return arr.astype(dtype) if dtype is not None else arr


def _to_device(v) -> jax.Array:
    if isinstance(v, QuantMetaRef):
        return v.materialize()
    if getattr(v, "dtype", None) == ml_dtypes.bfloat16 and not isinstance(v, jax.Array):
        # ship as uint16 bits: bf16 host<->device copies take a slow
        # conversion path (~3x) on the tunneled runtime.  (Loader output
        # may be a transposed mmap view — make it contiguous for .view.)
        host = np.ascontiguousarray(np.asarray(v))
        return jax.lax.bitcast_convert_type(
            jnp.asarray(host.view(np.uint16)), jnp.bfloat16)
    return jnp.asarray(v)


def _device_layer(lp: Dict) -> Dict:
    return {k: _to_device(v) for k, v in lp.items()}


def _host_layer(lp: Dict) -> Dict:
    out = {}
    for k, v in lp.items():
        if v.dtype == jnp.bfloat16:
            bits = jax.lax.bitcast_convert_type(v, jnp.uint16)
            out[k] = np.asarray(jax.device_get(bits)).view(ml_dtypes.bfloat16)
        else:
            out[k] = np.asarray(jax.device_get(v))
    return out


# ---------------------------------------------------------------------------
# Incremental stage scheduling
#
# Legacy behaviour recomputes the full block prefix for every stage's Hessian
# pass plus one final block forward (the reference does the same per-stage
# forwards, ``llama.py:108-136,184-191``).  The incremental plan instead
# caches each stage's captured input activation and *injects* it into later
# stage forwards (``models/llama.py block_apply(inject=...)``) — XLA DCE
# removes the injected value's producing compute, so attention/qkv run once
# per block instead of once per downstream stage.  This is the functional
# analogue of the reference's replay records (``llama.py:171-179``), but it
# also accelerates the Hessian passes, not just the downstream replay.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _IncPlan:
    """Per-block incremental execution plan (model-agnostic, built once).

    ``steps`` has one entry per Hessian stage plus a final entry for the
    block-output forward.  Entry k: ``(inject, cache, uses_input)`` —
    which cached captures (stage-first names) to inject, whether to cache
    this stage's own capture, and whether the block input batch is live.
    ``last_use[name]`` (or ``last_use['input']``) is the last step index
    consuming the cache, for buffer donation + freeing.
    """

    injects: tuple  # per step: tuple of stage-first names to inject
    cache: tuple  # per hessian stage: bool — cache this stage's capture
    uses_input: tuple  # per step: bool
    last_use: tuple  # ((name, step_idx), ...) incl. 'input'

    def last_use_of(self, name: str) -> int:
        return dict(self.last_use).get(name, -1)


def _plan_incremental(cfg, lp_struct, x_struct, cs_struct, stage_list,
                      max_cache_ratio: float = 1.5) -> Optional[_IncPlan]:
    """Build the incremental plan by abstract tracing (zero real compute).

    A stage's capture is cached iff (a) recomputing it from the already-
    cached values involves MXU-scale work (``graph.analyze_live``), (b) it
    is at most ``max_cache_ratio`` times the block input's size (the MLP
    up-projection activation is ~2.7x hidden width on Llama — recomputing
    gate/up at the final forward is cheaper than holding gigabytes), and
    (c) some later step actually consumes it.
    """
    firsts = [st.linears[0] for st in stage_list]
    stage_idx = {f: k for k, f in enumerate(firsts)}
    members = {st.linears[0]: st.linears for st in stage_list}
    n_final = len(firsts)  # step index of the block-output forward

    cap_struct = jax.eval_shape(
        lambda lp, x, cs: L.block_apply(cfg, lp, x, cs[0], cs[1],
                                        capture=tuple(firsts))[1],
        lp_struct, x_struct, cs_struct)

    n_lp = len(jax.tree_util.tree_leaves(lp_struct))
    n_x = len(jax.tree_util.tree_leaves(x_struct))
    n_cs = len(jax.tree_util.tree_leaves(cs_struct))

    def trace(capture_name, inject_firsts):
        """Trace one step; returns (x_live, {inject_first: live}, expensive_capture)."""

        def fn(lp, x, cs, inj):
            injd = {m: inj[i] for i, f in enumerate(inject_firsts)
                    for m in members[f]}
            out, caps = L.block_apply(
                cfg, lp, x, cs[0], cs[1],
                capture=(capture_name,) if capture_name else (), inject=injd)
            return caps[capture_name] if capture_name else out

        closed = jax.make_jaxpr(fn)(
            lp_struct, x_struct, cs_struct,
            [cap_struct[f] for f in inject_firsts])
        jaxpr = closed.jaxpr
        live, expensive = graph.analyze_live(jaxpr, jaxpr.outvars)
        x_live = any(id(v) in live
                     for v in jaxpr.invars[n_lp:n_lp + n_x])
        inj_vars = jaxpr.invars[n_lp + n_x + n_cs:]
        inj_live = {f: id(v) in live for f, v in zip(inject_firsts, inj_vars)}
        return x_live, inj_live, expensive

    x_bytes = x_struct.size * x_struct.dtype.itemsize

    # Candidate selection: expensive to recompute + small enough to hold.
    candidates = []
    for k, first in enumerate(firsts):
        avail = list(candidates)
        _, _, expensive = trace(first, avail)
        cs_ = cap_struct[first]
        if expensive and cs_.size * cs_.dtype.itemsize <= max_cache_ratio * x_bytes:
            candidates.append(first)

    # Liveness fixpoint: drop candidates no later step consumes; dropping one
    # changes what the remaining steps recompute, so iterate.
    for _ in range(len(firsts) + 1):
        injects, uses_input, used_anywhere = [], [], set()
        for k, first in enumerate(firsts):
            avail = [c for c in candidates if stage_idx[c] < k]
            x_live, inj_live, _ = trace(first, avail)
            live_inj = tuple(c for c in avail if inj_live[c])
            injects.append(live_inj)
            uses_input.append(x_live)
            used_anywhere.update(live_inj)
        x_live, inj_live, _ = trace(None, candidates)
        final_inj = tuple(c for c in candidates if inj_live[c])
        injects.append(final_inj)
        uses_input.append(x_live)
        used_anywhere.update(final_inj)
        kept = [c for c in candidates if c in used_anywhere]
        if kept == candidates:
            break
        candidates = kept

    last_use: Dict[str, int] = {}
    for k, inj in enumerate(injects):
        for c in inj:
            last_use[c] = k
        if uses_input[k]:
            last_use[graph.INPUT] = k
    return _IncPlan(
        injects=tuple(injects),
        cache=tuple(f in candidates for f in firsts),
        uses_input=tuple(uses_input),
        last_use=tuple(sorted(last_use.items())),
    )


_inc_step_cache: Dict = {}


def _inc_hess_step_for(cfg, stage_linears: tuple, inject_firsts: tuple,
                       members_map: tuple, want_capture: bool,
                       donate_inj: tuple, use_kernel: bool,
                       window=L.AUTO_WINDOW, qk_l2=None):
    """Jitted Hessian step with activation injection, running ALL
    calibration batches under ONE ``lax.fori_loop`` dispatch (round-5
    host-tax fix: the old per-batch dispatch loop paid one host round
    trip per batch per stage — measured 7.4 → 6.46 s/block wall on the
    tunneled host; captures accumulate in place via
    ``dynamic_update_index_in_dim``, the decode fori tick's proven
    no-double-buffering pattern).

    Args at call time: ``(lp, xs (n_b, bs, L, D), cos_sin, h, *inj)`` with
    each injected cache stacked ``(n_b, ...)``.  Donates the accumulator
    and any injected cache stacks at their last use.  Returns ``h`` (and
    the stacked capture when planned).
    """
    key = ("hess", cfg, stage_linears, inject_firsts, members_map,
           want_capture, donate_inj, use_kernel, window, qk_l2)
    if key not in _inc_step_cache:
        first = stage_linears[0]
        members = dict(members_map)
        donate = (3,) + tuple(i + 4 for i, d in enumerate(donate_inj) if d)

        @functools.partial(jax.jit, donate_argnums=donate)
        def step(lp, xs, cos_sin, h, *inj):
            n_b = xs.shape[0]

            def body(b, carry):
                h, caps_acc = carry
                xb = jax.lax.dynamic_index_in_dim(xs, b, 0, keepdims=False)
                inj_b = tuple(
                    jax.lax.dynamic_index_in_dim(a, b, 0, keepdims=False)
                    for a in inj)
                injd = {m: inj_b[i] for i, f in enumerate(inject_firsts)
                        for m in members[f]}
                _, caps = L.block_apply(cfg, lp, xb, cos_sin[0], cos_sin[1],
                                        qk_l2=qk_l2,
                                        capture=(first,), inject=injd,
                                        window=window)
                act = caps[first]
                st = hs.accumulate(
                    hs.HessianState(h, jnp.zeros((), jnp.int32)), act,
                    use_kernel=use_kernel)
                if want_capture:
                    caps_acc = jax.lax.dynamic_update_index_in_dim(
                        caps_acc, act, b, 0)
                return st.hessian, caps_acc

            if want_capture:
                act_struct = jax.eval_shape(
                    lambda lp, xb, cs, i: L.block_apply(
                        cfg, lp, xb, cs[0], cs[1], qk_l2=qk_l2,
                        capture=(first,),
                        inject={m: i[k] for k, f in enumerate(inject_firsts)
                                for m in members[f]},
                        window=window)[1][first],
                    lp, xs[0], cos_sin, [a[0] for a in inj])
                caps0 = jnp.zeros((n_b,) + act_struct.shape,
                                  act_struct.dtype)
            else:
                caps0 = jnp.zeros((), jnp.float32)  # unused dummy
            h, caps = jax.lax.fori_loop(0, n_b, body, (h, caps0))
            return (h, caps) if want_capture else h

        _inc_step_cache[key] = step
    return _inc_step_cache[key]


def _inc_final_for(cfg, inject_firsts: tuple, members_map: tuple,
                   uses_input: bool, donate_inj: tuple, window=L.AUTO_WINDOW,
                   qk_l2=None):
    key = ("final", cfg, inject_firsts, members_map, uses_input, donate_inj,
           window, qk_l2)
    if key not in _inc_step_cache:
        members = dict(members_map)
        donate = tuple(i + 3 for i, d in enumerate(donate_inj) if d)
        if uses_input:
            donate = (1,) + donate

        @functools.partial(jax.jit, donate_argnums=donate)
        def fwd(lp, xs, cos_sin, *inj):
            n_b = xs.shape[0]
            outs0 = jnp.zeros(xs.shape, xs.dtype)

            def body(b, outs):
                xb = jax.lax.dynamic_index_in_dim(xs, b, 0, keepdims=False)
                inj_b = tuple(
                    jax.lax.dynamic_index_in_dim(a, b, 0, keepdims=False)
                    for a in inj)
                injd = {m: inj_b[i] for i, f in enumerate(inject_firsts)
                        for m in members[f]}
                out, _ = L.block_apply(cfg, lp, xb, cos_sin[0], cos_sin[1],
                                       inject=injd, window=window,
                                       qk_l2=qk_l2)
                return jax.lax.dynamic_update_index_in_dim(outs, out, b, 0)

            return jax.lax.fori_loop(0, n_b, body, outs0)

        _inc_step_cache[key] = fwd
    return _inc_step_cache[key]


def _wave_hess_step_for(cfg, firsts: tuple, use_kernel: bool,
                        window=L.AUTO_WINDOW, qk_l2=None):
    """Jitted multi-stage Hessian step: ONE block forward captures every
    wave member's input and accumulates all their Hessians (independent
    stages — ``graph.stage_waves``).  Collapses a MoE block's ``2E``
    per-expert stage forwards into two."""
    key = ("wave", cfg, firsts, use_kernel, window, qk_l2)
    if key not in _inc_step_cache:

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(lp, xs, cos_sin, hs_t):
            def body(b, hs_t):
                xb = jax.lax.dynamic_index_in_dim(xs, b, 0, keepdims=False)
                _, caps = L.block_apply(cfg, lp, xb, cos_sin[0], cos_sin[1],
                                        qk_l2=qk_l2,
                                        capture=firsts, window=window)
                out = []
                for f, h in zip(firsts, hs_t):
                    st = hs.accumulate(
                        hs.HessianState(h, jnp.zeros((), jnp.int32)),
                        caps[f], use_kernel=use_kernel)
                    out.append(st.hessian)
                return tuple(out)

            return jax.lax.fori_loop(0, xs.shape[0], body, hs_t)

        _inc_step_cache[key] = step
    return _inc_step_cache[key]


def _split_wave_by_budget(wave, d_ins, budget_bytes: int):
    """Split a wave so concurrent fp32 Hessians stay under ``budget_bytes``
    (a 70B-class MoE down-wave would otherwise hold E x d_ff² fp32 at
    once).  Splitting preserves correctness — sub-waves of an independent
    set are still independent."""
    chunks, cur, cur_bytes = [], [], 0
    for st, d in zip(wave, d_ins):
        b = 4 * d * d
        if cur and cur_bytes + b > budget_bytes:
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(st)
        cur_bytes += b
    if cur:
        chunks.append(cur)
    return chunks


def _quantize_block_waves(cfg, qcfg, lp, li, xs, cos_sin, waves, n_seq,
                          solve_stage, pending, mesh=None,
                          window=L.AUTO_WINDOW, qk_l2=None,
                          hessian_budget: int = 4 << 30) -> list:
    """One block via wave-fused Hessian passes; returns next-block inputs.

    Numerically identical to the per-stage loop: every wave member's
    parents are quantized before the wave's forward runs, and members are
    mutually independent, so capturing them from one forward observes
    exactly the activations the per-stage loop would."""
    for wave in waves:
        d_ins = [lp[st.linears[0]].shape[0] for st in wave]
        for chunk in _split_wave_by_budget(wave, d_ins, hessian_budget):
            firsts = tuple(st.linears[0] for st in chunk)
            if mesh is None:
                step = _wave_hess_step_for(cfg, firsts,
                                           qcfg.use_hessian_kernel, window,
                                           qk_l2=qk_l2)
                hs_t = tuple(
                    jnp.zeros((lp[f].shape[0],) * 2, jnp.float32)
                    for f in firsts)
                reduce_h = lambda h: h
            else:
                from gptq_v2_tpu.parallel import dp as DP

                key = ("dp-wave", mesh, cfg, firsts,
                       qcfg.use_hessian_kernel, window, qk_l2)
                if key not in _inc_step_cache:
                    _inc_step_cache[key] = DP.dp_wave_hessian_step(
                        mesh, cfg, firsts,
                        use_kernel=qcfg.use_hessian_kernel, window=window,
                        qk_l2=qk_l2)
                init, step, reduce_h = _inc_step_cache[key]
                hs_t = init(tuple(lp[f].shape[0] for f in firsts))
            for xb in xs:
                hs_t = step(lp, xb, cos_sin, hs_t)
            for st_, h in zip(chunk, hs_t):
                state = hs.HessianState(reduce_h(h),
                                        jnp.asarray(n_seq, jnp.int32))
                inv = hs.invert(state, damp_ratio=qcfg.damp_ratio,
                                act_order=qcfg.act_order)
                del state
                solve_stage(lp, li, st_, inv, pending)
                del inv
            del hs_t

    if mesh is None:
        fwd = _block_fwd_for(cfg, window=window, qk_l2=qk_l2)
    else:
        from gptq_v2_tpu.parallel import dp as DP

        key = ("dp-fwd", mesh, cfg, window, qk_l2)
        if key not in _inc_step_cache:
            _inc_step_cache[key] = DP.dp_block_forward(mesh, cfg,
                                                       window=window,
                                                       qk_l2=qk_l2)
        fwd = _inc_step_cache[key]
    return [fwd(lp, xb, cos_sin) for xb in xs]


# One jitted hessian step per (config, stage) — reused across layers/batches.
_hess_step_cache: Dict = {}


def _hess_step_for(cfg, capture: tuple, use_kernel: bool, qk_l2=None,
                   window=L.AUTO_WINDOW):
    """All-batches Hessian accumulation in one dispatch (scan over the
    stacked ``xs``)."""
    key = (cfg, capture, use_kernel, window, qk_l2)
    if key not in _hess_step_cache:

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(lp, xs, cos_sin, h):
            cos, sin = cos_sin

            def body(b, h):
                xb = jax.lax.dynamic_index_in_dim(xs, b, 0, keepdims=False)
                _, caps = L.block_apply(cfg, lp, xb, cos, sin,
                                        capture=capture, window=window,
                                        qk_l2=qk_l2)
                st = hs.accumulate(
                    hs.HessianState(h, jnp.zeros((), jnp.int32)),
                    caps[capture[0]], use_kernel=use_kernel)
                return st.hessian

            return jax.lax.fori_loop(0, xs.shape[0], body, h)

        _hess_step_cache[key] = step
    return _hess_step_cache[key]


_block_fwd_cache: Dict = {}


def _block_fwd_for(cfg, window=L.AUTO_WINDOW, qk_l2=None):
    """All-batches block forward in one dispatch (``lax.map`` over the
    stacked ``(n_b, bs, L, D)`` batches)."""
    key = (cfg, window, qk_l2)
    if key not in _block_fwd_cache:

        @jax.jit
        def fwd(lp, xs, cos_sin):
            cos, sin = cos_sin
            outs0 = jnp.zeros(xs.shape, xs.dtype)

            def body(b, outs):
                xb = jax.lax.dynamic_index_in_dim(xs, b, 0, keepdims=False)
                out, _ = L.block_apply(cfg, lp, xb, cos, sin, window=window,
                                       qk_l2=qk_l2)
                return jax.lax.dynamic_update_index_in_dim(outs, out, b, 0)

            return jax.lax.fori_loop(0, xs.shape[0], body, outs0)

        _block_fwd_cache[key] = fwd
    return _block_fwd_cache[key]


def _stack_batches(batches: list) -> list:
    """List of per-batch ``(bs, ...)`` device arrays → list of stacked
    ``(n, bs, ...)`` chunks for the scan-based step functions (round-5
    host-tax fix: one dispatch covers every batch).  A ragged final batch
    becomes its own singleton chunk (different inner shape → its own
    compiled program)."""
    if len(batches) > 1 and batches[-1].shape[0] != batches[0].shape[0]:
        return [jnp.stack(batches[:-1]), jnp.stack(batches[-1:])]
    return [jnp.stack(batches)]


def _pack_meta_for_host(meta: Dict) -> Dict:
    """Shrink device→host quant_meta traffic (the per-block bottleneck on
    tunneled runtimes: ~130 MB/block of uint8 codes at ~32 MB/s).  INT4
    codes pack two-per-byte; f16/bf16 tensors ship as uint16 bits (the
    float conversion path is ~3x slower).  Inverse: :func:`_unpack_meta`."""
    out = dict(meta)
    qw = out.get("qweight")
    if (isinstance(qw, jax.Array) and qw.shape[1] % 2 == 0
            and np.asarray(out["group_bit_widths"]).max() <= 4):
        out["qweight__nibbles"] = qw[:, 0::2] | (qw[:, 1::2] << 4)
        del out["qweight"]
    for k, v in list(out.items()):
        if isinstance(v, jax.Array) and v.dtype in (jnp.float16, jnp.bfloat16):
            tag = "f16" if v.dtype == jnp.float16 else "bf16"
            out[f"{k}__{tag}bits"] = jax.lax.bitcast_convert_type(v, jnp.uint16)
            del out[k]
    return out


def _unpack_meta(meta: Dict) -> Dict:
    """Host-side inverse of :func:`_pack_meta_for_host` (np arrays in/out)."""
    out = {}
    for k, v in meta.items():
        if k == "qweight__nibbles":
            qw = np.empty((v.shape[0], v.shape[1] * 2), np.uint8)
            qw[:, 0::2] = v & 0xF
            qw[:, 1::2] = v >> 4
            out["qweight"] = qw
        elif k.endswith("__f16bits"):
            out[k[:-len("__f16bits")]] = v.view(np.float16)
        elif k.endswith("__bf16bits"):
            out[k[:-len("__bf16bits")]] = v.view(ml_dtypes.bfloat16)
        elif isinstance(v, np.ndarray) and v.dtype.kind == "V" \
                and v.dtype.itemsize == 2:
            # legacy files: np.savez writes ml_dtypes.bfloat16 as raw |V2
            out[k] = v.view(ml_dtypes.bfloat16)
        else:
            out[k] = v
    return out


def npz_payload(meta: Dict) -> Dict:
    """quant_meta → npz-safe dict: numpy can't round-trip ml_dtypes
    bfloat16 through ``.npz`` (it writes an opaque ``|V2`` void dtype), so
    bf16 tensors store as ``{key}__bf16bits`` uint16; :func:`_unpack_meta`
    restores them on load."""
    out = {}
    for k, v in meta.items():
        if v is None:
            continue
        v = np.asarray(v)
        if v.dtype == ml_dtypes.bfloat16:
            out[f"{k}__bf16bits"] = v.view(np.uint16)
        else:
            out[k] = v
    return out


def ensure_optional_meta(meta: Dict) -> Dict:
    """Default the optional quant_meta fields (shared by every loader)."""
    for opt in ("qscale", "sscale", "scale_bit_width"):
        meta.setdefault(opt, None)
    return meta


def _config_tag(qcfg: QuantConfig) -> str:
    return repr(sorted(qcfg.__dict__.items()))


def _load_layer_npz(path: Path):
    """Inverse of the per-layer streaming save below.

    Returns ``(meta, metrics, config_tag)``; ``config_tag`` identifies the
    QuantConfig that produced the file (absent in pre-tag files -> '')."""
    z = np.load(path)
    meta: Dict = {}
    metrics: Dict = {}
    tag = ""
    for k in z.files:
        if k == "config_tag":
            tag = str(z[k])
        elif k.startswith("metric_"):
            metrics[k[len("metric_"):]] = float(z[k])
        else:
            meta[k] = z[k]
    return ensure_optional_meta(_unpack_meta(meta)), metrics, tag


def quantize_model(
    cfg: L.LlamaConfig,
    params: L.Params,
    encodings: np.ndarray,  # (n_seq, seqlen) int
    qcfg: QuantConfig = QuantConfig(),
    batch_size: int = 16,
    save_dir: Optional[str] = None,
    resume: bool = True,
    offload: str = "reconstruct",
    mesh=None,
    incremental: bool = True,
) -> Dict[str, Dict]:
    """Quantize all decoder blocks in place (params is updated per layer).

    Returns ``{'data': {name: quant_meta}, 'metrics': {name: metrics}}``
    with the reference's canonical names ``model.layers.{i}.{linear}``
    (reference ``llama.py:167-173``).

    With ``save_dir`` set, each layer's result streams to
    ``{save_dir}/{canonical}.npz`` and — new over the reference, which only
    saves once at the end (``main.py:37-38``) — ``resume=True`` skips any
    stage whose layers are all already on disk, reloading their quantized
    weights instead of recomputing (mid-run restart costs only the block
    forwards).

    ``offload`` controls what replaces each finished block in ``params``:

    * ``"reconstruct"`` (default): a :class:`QuantMetaRef` per linear — no
      dense-weight device→host transfer at all (the quant_meta is already
      on the host); evaluation rematerializes on device, exactly as the
      reference keeps reconstructed layers (``llama.py:172-174``).
    * ``"host"``: the dense dequantized weights, copied to host RAM
      (needed if callers want plain arrays without lazy views).

    ``mesh``: shard calibration over the mesh ``data`` axis — each batch's
    block forward + Hessian accumulation runs as shard_map'd per-device
    work with one cross-device reduction per stage (``parallel/dp.py``);
    ``batch_size`` must divide by the data-axis size.

    ``incremental``: cache stage activations and inject them into later
    stage forwards so the expensive block prefix runs once per block instead
    of once per stage (see :func:`_plan_incremental`; numerically identical
    to the legacy per-stage recompute).  Works on single devices and over
    the mesh ``data`` axis; auto-disabled for RTN and blocks with
    resumable stages.
    """
    n_seq, seqlen = encodings.shape
    dt = cfg.jdtype
    results: Dict[str, Dict] = {"data": {}, "metrics": {}}
    save_path = Path(save_dir) if save_dir else None
    if save_path:
        save_path.mkdir(parents=True, exist_ok=True)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gptq_v2_tpu.parallel import dp as DP
        from gptq_v2_tpu.parallel.mesh import DATA_AXIS, dp_size

        assert batch_size % dp_size(mesh) == 0, (batch_size, dp_size(mesh))
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        replicated = NamedSharding(mesh, P())
        dp_fwd_cache: Dict = {}
        dp_hess_cache: Dict = {}

        def dp_fwd_for(win, ql2=None):
            if (win, ql2) not in dp_fwd_cache:
                dp_fwd_cache[win, ql2] = DP.dp_block_forward(
                    mesh, cfg, window=win, qk_l2=ql2)
            return dp_fwd_cache[win, ql2]

        def shard_batch(a):
            return jax.device_put(a, batch_sharding)

        def place_layer(lp):
            return {k: jax.device_put(v, replicated) for k, v in lp.items()}
    else:
        shard_batch = lambda a: a
        place_layer = lambda lp: lp

    positions = jnp.arange(seqlen)
    ropes = L.rope_tables(cfg, positions)
    cos_sin = ropes[0]  # shape-struct uses below; per-block table in the loop

    # Initial inputs: embedding of all calibration sequences (the functional
    # replacement for the reference's Catcher exception hack, llama.py:20-61).
    embed_w = _to_device(params["embed_tokens"])
    embed_fn = jax.jit(lambda w, t: L.embed_lookup(cfg, w, t))
    xs = []
    for b in range(0, n_seq, batch_size):
        xs.append(shard_batch(
            embed_fn(embed_w, jnp.asarray(encodings[b:b + batch_size]))))
    del embed_w
    if mesh is None:
        # single-device: stacked chunks feed the scan-based step functions
        # (one dispatch per stage instead of one per batch — the per-block
        # host tax on tunneled runtimes); DP keeps per-batch sharded arrays
        xs = _stack_batches(xs)

    # Stage schedule per block SIGNATURE (key set): homogeneous models
    # compute one schedule for all blocks; heterogeneous ones (DeepSeek
    # first_k_dense_replace, Qwen3-MoE interleaved dense layers) get one
    # schedule per distinct block shape, discovered lazily and cached.
    _sched_cache: Dict[tuple, tuple] = {}

    def _block_schedule(lp_real):
        sig = tuple(sorted(lp_real))
        if sig in _sched_cache:
            return _sched_cache[sig]
        lp0 = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), dict(lp_real))
        schedule = graph.extract_dependencies(
            lambda p, xb, cs: L.block_apply(cfg, p, xb, cs[0], cs[1])[0],
            lp0, jax.ShapeDtypeStruct((batch_size, seqlen, cfg.hidden_size),
                                      dt),
            (jax.ShapeDtypeStruct(cos_sin[0].shape, cos_sin[0].dtype),
             jax.ShapeDtypeStruct(cos_sin[1].shape, cos_sin[1].dtype)),
            exclude=L.NON_QUANTIZED_LINEARS,
        )
        stage_list = [st for st in schedule if st.linears != (graph.OUTPUT,)]

        # Wave fusion: mutually independent stages (MoE experts) capture
        # their Hessians from ONE shared forward per wave.  Dense blocks
        # have only singleton waves and keep incremental injection.
        waves = graph.stage_waves(stage_list)
        use_waves = (incremental and not qcfg.rtn
                     and any(len(w) > 1 for w in waves))
        if use_waves:
            logger.info("wave fusion: %d stages in %d waves",
                        len(stage_list), len(waves))
        plan = members_map = None
        if incremental and not qcfg.rtn and not use_waves:
            cs_struct = (
                jax.ShapeDtypeStruct(cos_sin[0].shape, cos_sin[0].dtype),
                jax.ShapeDtypeStruct(cos_sin[1].shape, cos_sin[1].dtype))
            plan = _plan_incremental(
                cfg, lp0,
                jax.ShapeDtypeStruct((batch_size, seqlen, cfg.hidden_size),
                                     dt),
                cs_struct, stage_list)
            members_map = tuple((st.linears[0], st.linears)
                                for st in stage_list)
            logger.info(
                "incremental plan: caching %s",
                [st.linears[0]
                 for st, c in zip(stage_list, plan.cache) if c])
        _sched_cache[sig] = (stage_list, waves, use_waves, plan, members_map)
        return _sched_cache[sig]

    stage_list, waves, use_waves, plan, members_map = _block_schedule(
        dict(params["layers"][0]))

    def try_resume_stage(li, stage):
        """Loaded results for a fully-saved stage of THIS config, else None.

        Only results produced by the SAME QuantConfig resume — stale files
        from a different sweep point must recompute."""
        files = {name: save_path / f"model.layers.{li}.{name}.npz"
                 for name in stage.linears}
        if not all(f.exists() for f in files.values()):
            return None
        loaded = {name: _load_layer_npz(f) for name, f in files.items()}
        if not all(tag == _config_tag(qcfg) for _, _, tag in loaded.values()):
            logger.warning(
                "block %d stage %s: saved results are from a different "
                "QuantConfig; recomputing", li, stage.linears[0])
            return None
        return loaded

    def apply_resumed(lp, li, loaded):
        from gptq_v2_tpu.quant.quantizer import reconstruct_weight

        for name, (meta, metrics, _) in loaded.items():
            canonical = f"model.layers.{li}.{name}"
            results["data"][canonical] = meta
            results["metrics"][canonical] = metrics
            w = reconstruct_weight(meta, out_dtype=jnp.float32)
            lp[name] = w.T.astype(dt)
            logger.debug("%s resumed", canonical)

    def solve_stage(lp, li, stage, inv, pending):
        """Quantize every linear of one stage against its inverted Hessian,
        swapping dequantized weights into ``lp`` (the v2 error-propagation,
        reference ``llama.py:171-179``)."""
        t_stage = time.time()
        d_in = lp[stage.linears[0]].shape[0]
        for name in stage.linears:
            w = lp[name].T  # (out, in) solver layout
            n_groups = d_in // qcfg.group_size
            res = gq.gptq_quant(
                w, inv,
                [qcfg.group_size] * n_groups, [qcfg.bits] * n_groups,
                scale_bit_width=qcfg.scale_bit_width,
                quant_symmetric=qcfg.sym,
                quant_mse=qcfg.mse,
                quant_max_shrink=qcfg.mse_max_shrink,
                quant_n_grid=qcfg.mse_n_grid,
                quant_norm=qcfg.mse_norm,
                feedback_dtype=qcfg.feedback_dtype,
                save_dtype=dt,
                use_solver_kernel=qcfg.use_solver_kernel,
                keep_on_device=True,
            )
            lp[name] = res["quant"].T.astype(dt)
            canonical = f"model.layers.{li}.{name}"
            # start the device→host copies now (nibble-packed / bit-cast to
            # halve the bytes); they overlap the next stages' compute and
            # are collected at block end
            packed = _pack_meta_for_host(res["quant_meta"])
            for v in packed.values():
                if isinstance(v, jax.Array):
                    v.copy_to_host_async()
            results["data"][canonical] = packed
            results["metrics"][canonical] = res["metrics"]
            pending.append(canonical)
            del res
        logger.debug("block %d stage %s: solve %.2fs", li, stage.linears[0],
                     time.time() - t_stage)

    # NB: host collection stays inline at block end — deferring it by one
    # block to "overlap" the d2h copies with the next block's compute was
    # measured 2x SLOWER on the tunneled runtime (the transfer saturates
    # the tunnel and starves the next block's dispatch stream).
    for li in range(cfg.num_hidden_layers):
        t0 = time.time()
        win = cfg.layer_window(li)  # per-layer attention window (Gemma-2)
        ql2 = cfg.layer_qk_l2(li)  # Llama-4 L2 norm on rope layers only
        cos_sin = ropes[cfg.layer_rope(li)]  # Gemma-3 local/global rope
        stage_list, waves, use_waves, plan, members_map = _block_schedule(
            dict(params["layers"][li]))
        lp = place_layer(_device_layer(params["layers"][li]))
        pending: list = []  # canonical names with device-resident quant_meta

        resumed_stages: Dict[str, Dict] = {}
        if save_path and resume:
            for st in stage_list:
                r = try_resume_stage(li, st)
                if r is not None:
                    resumed_stages[st.linears[0]] = r

        if use_waves and not resumed_stages:
            xs = _quantize_block_waves(
                cfg, qcfg, lp, li, xs, cos_sin, waves, n_seq, solve_stage,
                pending, mesh=mesh, window=win, qk_l2=ql2)
            _finish_block(results, pending, save_path, qcfg, params, lp, li,
                          offload, dt)
            logger.info("finished block %d in %.2f s", li, time.time() - t0)
            continue

        if plan is not None and not resumed_stages:
            xs = _quantize_block_incremental(
                cfg, qcfg, lp, li, xs, cos_sin, stage_list, plan,
                members_map, n_seq, solve_stage, pending, mesh=mesh,
                window=win, qk_l2=ql2)
            _finish_block(results, pending, save_path, qcfg, params, lp, li,
                          offload, dt)
            logger.info("finished block %d in %.2f s", li, time.time() - t0)
            continue

        for stage in stage_list:
            first = stage.linears[0]
            d_in = lp[first].shape[0]

            if first in resumed_stages:
                apply_resumed(lp, li, resumed_stages[first])
                continue

            if not qcfg.rtn:
                if mesh is not None:
                    key = (cfg, (first,), qcfg.use_hessian_kernel, win,
                           ql2)
                    if key not in dp_hess_cache:
                        dp_hess_cache[key] = DP.dp_hessian_step(
                            mesh, cfg, (first,),
                            use_kernel=qcfg.use_hessian_kernel, window=win,
                            qk_l2=ql2)
                    init, step, reduce = dp_hess_cache[key]
                    h_parts = init(d_in)
                    for xb in xs:
                        h_parts = step(lp, xb, cos_sin, h_parts)
                    h = reduce(h_parts)
                    del h_parts
                else:
                    step = _hess_step_for(cfg, (first,),
                                          qcfg.use_hessian_kernel, window=win,
                                          qk_l2=ql2)
                    h = jnp.zeros((d_in, d_in), jnp.float32)
                    for xb in xs:
                        h = step(lp, xb, cos_sin, h)
                state = hs.HessianState(h, jnp.asarray(n_seq, jnp.int32))
                inv = hs.invert(state, damp_ratio=qcfg.damp_ratio,
                                act_order=qcfg.act_order)
                del h, state
            else:
                inv = None

            solve_stage(lp, li, stage, inv, pending)
            del inv

        # Inputs of the next block, computed with fully quantized weights
        # (reference llama.py:184-191).
        fwd = (dp_fwd_for(win, ql2) if mesh is not None
               else _block_fwd_for(cfg, window=win, qk_l2=ql2))
        xs = [fwd(lp, xb, cos_sin) for xb in xs]

        _finish_block(results, pending, save_path, qcfg, params, lp, li,
                      offload, dt)
        del lp
        logger.info("finished block %d in %.2f s", li, time.time() - t0)

    return results


def _quantize_block_incremental(cfg, qcfg, lp, li, xs, cos_sin, stage_list,
                                plan: _IncPlan, members_map, n_seq,
                                solve_stage, pending, mesh=None,
                                window=L.AUTO_WINDOW, qk_l2=None) -> list:
    """One block under the incremental plan; returns the next block's inputs.

    Per stage: one injected forward per batch accumulates the Hessian and
    (when planned) emits the capture for downstream injection; cache buffers
    are donated to XLA at their last use.  The final block forward also runs
    injected — at most one application of each linear per batch per block.
    With ``mesh``, batches and caches shard over the ``data`` axis and the
    Hessian reduces once per stage (``parallel/dp.py``).
    """
    n_final = len(stage_list)
    cache: Dict[str, list] = {}

    for k, stage in enumerate(stage_list):
        first = stage.linears[0]
        d_in = lp[first].shape[0]
        inj_names = plan.injects[k]
        donate_inj = tuple(plan.last_use_of(c) == k for c in inj_names)
        if mesh is None:
            step = _inc_hess_step_for(cfg, stage.linears, inj_names,
                                      members_map, plan.cache[k], donate_inj,
                                      qcfg.use_hessian_kernel, window=window,
                                      qk_l2=qk_l2)
            h = jnp.zeros((d_in, d_in), jnp.float32)
            reduce_h = lambda h: h
        else:
            key = ("dp-hess", mesh, cfg, stage.linears, inj_names,
                   plan.cache[k], donate_inj, qcfg.use_hessian_kernel, window,
                   qk_l2)
            if key not in _inc_step_cache:
                from gptq_v2_tpu.parallel import dp as DP

                _inc_step_cache[key] = DP.dp_inc_hessian_step(
                    mesh, cfg, stage.linears, inj_names, members_map,
                    plan.cache[k], donate_inj,
                    use_kernel=qcfg.use_hessian_kernel, window=window,
                    qk_l2=qk_l2)
            init, step, reduce_h = _inc_step_cache[key]
            h = init(d_in)
        if plan.cache[k]:
            cache[first] = [None] * len(xs)
        for b, xb in enumerate(xs):
            out = step(lp, xb, cos_sin, h,
                       *(cache[c][b] for c in inj_names))
            if plan.cache[k]:
                h, cache[first][b] = out
            else:
                h = out
            for c, d in zip(inj_names, donate_inj):
                if d:
                    cache[c][b] = None  # buffer donated to XLA
        for c, d in zip(inj_names, donate_inj):
            if d:
                cache.pop(c, None)

        state = hs.HessianState(reduce_h(h), jnp.asarray(n_seq, jnp.int32))
        inv = hs.invert(state, damp_ratio=qcfg.damp_ratio,
                        act_order=qcfg.act_order)
        del h, state
        solve_stage(lp, li, stage, inv, pending)
        del inv

    inj_names = plan.injects[n_final]
    donate_inj = tuple(plan.last_use_of(c) == n_final for c in inj_names)
    if mesh is None:
        fwd = _inc_final_for(cfg, inj_names, members_map,
                             plan.uses_input[n_final], donate_inj,
                             window=window, qk_l2=qk_l2)
    else:
        key = ("dp-final", mesh, cfg, inj_names, plan.uses_input[n_final],
               donate_inj, window, qk_l2)
        if key not in _inc_step_cache:
            from gptq_v2_tpu.parallel import dp as DP

            _inc_step_cache[key] = DP.dp_inc_final_fwd(
                mesh, cfg, inj_names, members_map,
                plan.uses_input[n_final], donate_inj, window=window,
                qk_l2=qk_l2)
        fwd = _inc_step_cache[key]
    new_xs = []
    for b, xb in enumerate(xs):
        new_xs.append(fwd(lp, xb, cos_sin,
                          *(cache[c][b] for c in inj_names)))
        for c, d in zip(inj_names, donate_inj):
            if d:
                cache[c][b] = None
    cache.clear()
    return new_xs


def _finish_block(results, pending, save_path, qcfg, params, lp, li,
                  offload, dt) -> None:
    """Collect the async quant_meta copies (overlapped with the stages
    above), release their device buffers, stream to disk, and offload the
    finished block's parameters."""
    for canonical in pending:
        meta = _unpack_meta(
            {k: (np.asarray(v) if isinstance(v, jax.Array) else v)
             for k, v in results["data"][canonical].items()})
        results["data"][canonical] = meta
        results["metrics"][canonical] = {
            k: float(v) for k, v in results["metrics"][canonical].items()}
        logger.debug("%s %s", canonical, results["metrics"][canonical])
        if save_path:
            np.savez(save_path / f"{canonical}.npz",
                     **npz_payload(meta),
                     config_tag=_config_tag(qcfg),
                     **{f"metric_{k}": v
                        for k, v in results["metrics"][canonical].items()})

    if offload == "host":
        params["layers"][li] = _host_layer(lp)
    else:
        new_lp: Dict = {}
        for name in lp:
            canonical = f"model.layers.{li}.{name}"
            if canonical in results["data"]:
                new_lp[name] = QuantMetaRef(results["data"][canonical], dt)
            else:  # norms — tiny
                new_lp[name] = np.asarray(jax.device_get(lp[name]))
        params["layers"][li] = new_lp
