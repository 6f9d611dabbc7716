"""Data-parallel Hessian accumulation for GPTQ calibration.

The quantization pipeline's hot loop is the per-stage calibration forward +
``H += XᵀX`` (SURVEY.md §3.4: ~8.8 TFLOP per stage at 7B).  It is
embarrassingly parallel over calibration sequences, so the mesh ``data``
axis shards the batch: each device runs the block forward on its
sequences and accumulates a **partial** Hessian; one reduction per stage
(not per batch) merges them.

Partials are materialized as an explicit ``(dp, D, D)`` array sharded over
``data`` — device-local state stays visible in the type, and the final
``sum(0)`` lowers to a single XLA all-reduce/reduce per stage.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.quant import hessian as hs
from gptq_v2_tpu.parallel.mesh import DATA_AXIS, dp_size


def dp_hessian_step(mesh, cfg: L.LlamaConfig, capture: Tuple[str, ...],
                    use_kernel: bool = True, window=L.AUTO_WINDOW,
                    qk_l2=None):
    """Build ``(init, step, reduce)`` for data-parallel Hessian accumulation.

    * ``init(d_in) -> h_parts``: zero partials, ``(dp, D, D)`` sharded over
      ``data``.
    * ``step(lp, xb, cos_sin, h_parts) -> h_parts``: one calibration batch;
      ``xb``'s leading dim shards over ``data`` (must divide by dp).
      Per-device compute is the same block forward + Pallas Hessian kernel
      as the single-chip path (``pipeline._hess_step_for``); no collective.
    * ``reduce(h_parts) -> (D, D)``: the per-stage merge (one all-reduce).
    """
    dp = dp_size(mesh)

    def init(d_in: int):
        return jax.device_put(
            jnp.zeros((dp, d_in, d_in), jnp.float32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )

    def local(lp, xb, cs, hp):
        _, caps = L.block_apply(cfg, lp, xb, cs[0], cs[1], capture=capture,
                                window=window, qk_l2=qk_l2)
        act = caps[capture[0]]
        st = hs.accumulate(
            hs.HessianState(hp[0], jnp.zeros((), jnp.int32)), act,
            use_kernel=use_kernel,
        )
        return st.hessian[None]

    def step_impl(lp, xb, cos_sin, h_parts):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(lp, xb, cos_sin, h_parts)

    step = jax.jit(step_impl, donate_argnums=(3,))

    @jax.jit
    def reduce(h_parts):
        return h_parts.sum(axis=0)

    return init, step, reduce


def dp_wave_hessian_step(mesh, cfg: L.LlamaConfig, firsts: Tuple[str, ...],
                         use_kernel: bool = True, window=L.AUTO_WINDOW,
                         qk_l2=None):
    """Data-parallel variant of the pipeline's wave-fused Hessian step
    (``pipeline._wave_hess_step_for``): one shard_map'd block forward per
    batch captures EVERY wave member's input and accumulates all their
    partial Hessians; one reduction per stage merges them."""
    dp = dp_size(mesh)

    def init(d_ins: Tuple[int, ...]):
        return tuple(
            jax.device_put(jnp.zeros((dp, d, d), jnp.float32),
                           NamedSharding(mesh, P(DATA_AXIS)))
            for d in d_ins)

    def local(lp, xb, cs, hps):
        _, caps = L.block_apply(cfg, lp, xb, cs[0], cs[1], capture=firsts,
                                window=window, qk_l2=qk_l2)
        out = []
        for f, hp in zip(firsts, hps):
            st = hs.accumulate(
                hs.HessianState(hp[0], jnp.zeros((), jnp.int32)), caps[f],
                use_kernel=use_kernel)
            out.append(st.hessian[None])
        return tuple(out)

    def step_impl(lp, xb, cos_sin, hps):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(lp, xb, cos_sin, hps)

    step = jax.jit(step_impl, donate_argnums=(3,))

    @jax.jit
    def reduce(h_parts):
        return h_parts.sum(axis=0)

    return init, step, reduce


def dp_inc_hessian_step(mesh, cfg: L.LlamaConfig, stage_linears: Tuple[str, ...],
                        inject_firsts: Tuple[str, ...], members_map: tuple,
                        want_capture: bool, donate_inj: Tuple[bool, ...],
                        use_kernel: bool = True, window=L.AUTO_WINDOW,
                        qk_l2=None):
    """Data-parallel variant of the pipeline's incremental Hessian step
    (``pipeline._inc_hess_step_for``): injected stage activations are
    sharded over ``data`` like the batch; the per-device forward captures
    this stage's activation shard for downstream injection.

    Returns ``(init, step, reduce)``; ``step(lp, xb, cos_sin, h_parts,
    *inj)`` donates the partials and last-use injected caches.
    """
    dp = dp_size(mesh)
    members = dict(members_map)
    first = stage_linears[0]

    def init(d_in: int):
        return jax.device_put(
            jnp.zeros((dp, d_in, d_in), jnp.float32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )

    def local(lp, xb, cs, hp, *inj):
        injd = {m: inj[i] for i, f in enumerate(inject_firsts)
                for m in members[f]}
        _, caps = L.block_apply(cfg, lp, xb, cs[0], cs[1], capture=(first,),
                                inject=injd, window=window, qk_l2=qk_l2)
        act = caps[first]
        st = hs.accumulate(
            hs.HessianState(hp[0], jnp.zeros((), jnp.int32)), act,
            use_kernel=use_kernel,
        )
        return (st.hessian[None], act) if want_capture else st.hessian[None]

    def step_impl(lp, xb, cos_sin, h_parts, *inj):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(DATA_AXIS))
                     + (P(DATA_AXIS),) * len(inj),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)) if want_capture
                      else P(DATA_AXIS),
            check_vma=False,
        )(lp, xb, cos_sin, h_parts, *inj)

    donate = (3,) + tuple(i + 4 for i, d in enumerate(donate_inj) if d)
    step = jax.jit(step_impl, donate_argnums=donate)

    @jax.jit
    def reduce(h_parts):
        return h_parts.sum(axis=0)

    return init, step, reduce


def dp_inc_final_fwd(mesh, cfg: L.LlamaConfig, inject_firsts: Tuple[str, ...],
                     members_map: tuple, uses_input: bool,
                     donate_inj: Tuple[bool, ...], window=L.AUTO_WINDOW,
                     qk_l2=None):
    """Data-parallel injected block-output forward
    (``pipeline._inc_final_for`` over the mesh)."""
    members = dict(members_map)

    def local(lp, xb, cs, *inj):
        injd = {m: inj[i] for i, f in enumerate(inject_firsts)
                for m in members[f]}
        out, _ = L.block_apply(cfg, lp, xb, cs[0], cs[1], inject=injd,
                               window=window, qk_l2=qk_l2)
        return out

    def fwd_impl(lp, xb, cos_sin, *inj):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()) + (P(DATA_AXIS),) * len(inj),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(lp, xb, cos_sin, *inj)

    donate = tuple(i + 3 for i, d in enumerate(donate_inj) if d)
    if uses_input:
        donate = (1,) + donate
    return jax.jit(fwd_impl, donate_argnums=donate)


def dp_block_forward(mesh, cfg: L.LlamaConfig, window=L.AUTO_WINDOW,
                     qk_l2=None):
    """Jitted data-parallel block forward: recompute next-block inputs with
    the batch sharded over ``data`` (pipeline HOT LOOP 4,
    reference ``llama.py:184-191``)."""

    def local(lp, xb, cs):
        out, _ = L.block_apply(cfg, lp, xb, cs[0], cs[1], window=window,
                               qk_l2=qk_l2)
        return out

    def fwd(lp, xb, cos_sin):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(lp, xb, cos_sin)

    return jax.jit(fwd)
