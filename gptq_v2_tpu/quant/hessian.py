"""Hessian accumulation and inversion for GPTQ calibration.

Re-implements the semantics of the reference ``HessianHook``
(reference: ``gptq_py.py:9-66``) in functional JAX:

* ``H += XᵀX`` accumulated in **fp32** from lower-precision activations
  (reference gptq_py.py:29-36; kernels accumulate fp32).  The TPU hot path
  is a Pallas MXU kernel exploiting symmetry (``ops/hessian_pallas.py``);
  the jnp twin here is the correctness reference.
* ``invert``: ``H ← 2H/n_samples``; dead-diagonal repair; optional
  **act-order** permutation by descending diagonal; adaptive dampening
  ``damp = ratio · mean(diag(H))`` *added cumulatively* until the Cholesky
  chain is NaN-free; result is the **upper Cholesky factor U of H⁻¹**
  (``H⁻¹ = UᵀU``) — the exllamav2 formulation the solver expects
  (reference gptq_py.py:39-66).

``n_samples`` counts *sequences* (the leading batch dim), not tokens,
matching reference gptq_py.py:27.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class HessianState(NamedTuple):
    """Accumulated calibration state for one equivalence set of linears."""

    hessian: jax.Array  # (D, D) fp32
    n_samples: jax.Array  # () int32 — number of sequences seen


class InvertedHessian(NamedTuple):
    """Output of :func:`invert`: solver-ready inverse-Hessian factor."""

    hessian: jax.Array  # (D, D) fp32 — permuted, damped H (post-invert state)
    hessian_inv: jax.Array  # (D, D) fp32 — upper Cholesky factor of H⁻¹
    perm: Optional[jax.Array]  # (D,) int32 act-order permutation, or None
    perm_inv: Optional[jax.Array]  # (D,) int32 inverse permutation, or None


def init_state(dim: int) -> HessianState:
    return HessianState(
        hessian=jnp.zeros((dim, dim), dtype=jnp.float32),
        n_samples=jnp.zeros((), dtype=jnp.int32),
    )


def accumulate(state: HessianState, inp: jax.Array, use_kernel: bool = True) -> HessianState:
    """Accumulate ``H += XᵀX`` over a batch of activations.

    ``inp``: ``(..., N, D)`` in any float dtype.  fp32 accumulation on the
    MXU via ``preferred_element_type`` (the TPU-native equivalent of the
    reference's Triton/CUTLASS fp32 accumulators).
    """
    if inp.ndim <= 2:
        inp = inp[None]
    n_new = inp.shape[0]
    x = inp.reshape(-1, inp.shape[-1])
    if use_kernel:
        # bf16 inputs on the MXU with fp32 accumulation — native TPU path.
        from gptq_v2_tpu.ops.hessian_pallas import accumulate_hessian

        h = accumulate_hessian(state.hessian, x)
    else:
        x32 = x.astype(jnp.float32)
        h = state.hessian + jax.lax.dot_general(
            x32, x32,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    return HessianState(hessian=h, n_samples=state.n_samples + n_new)


@functools.partial(jax.jit, static_argnames=("act_order",))
def _prepare(hessian, n_samples, damp_ratio, act_order: bool):
    """Scale, dead-diagonal repair, act-order permute; returns
    ``(h, damp, perm, perm_inv)``.  Mirrors reference gptq_py.py:41-50."""
    # Repair the stale upper-tile triangle left by the symmetric Pallas
    # accumulation kernel (identity for an already-symmetric H).
    from gptq_v2_tpu.ops.hessian_pallas import symmetrize

    h = symmetrize(hessian) * (2.0 / n_samples.astype(jnp.float32))

    diag = jnp.diagonal(h)
    dead = diag == 0.0
    d = h.shape[0]
    didx = jnp.arange(d)
    h = h.at[didx, didx].set(jnp.where(dead, 1.0, diag))

    if act_order:
        perm = jnp.argsort(-jnp.diagonal(h))
        h = h[perm][:, perm]
        perm_inv = jnp.argsort(perm)
    else:
        perm = perm_inv = None
    damp = damp_ratio * jnp.mean(jnp.diagonal(h))
    return h, damp, perm, perm_inv


@jax.jit
def _add_damp(h, damp):
    d = jnp.arange(h.shape[0])
    return h.at[d, d].add(damp)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _chol_inv_upper(h: jax.Array, chunk: int = 2048) -> jax.Array:
    """Upper Cholesky factor ``U`` of ``H⁻¹`` (``H⁻¹ = UᵀU``).

    One "anti-Cholesky" + one triangular inverse instead of the reference's
    chol → full cho_solve → chol chain (gptq_py.py:59-61) — identical result
    by uniqueness of the Cholesky factor: with ``U' = flip(chol(flip(H)))``
    (upper, ``H = U'U'ᵀ``), ``U = U'⁻¹`` satisfies ``UᵀU = H⁻¹``.  The
    triangular solve runs in RHS column chunks to bound XLA temp memory
    (a full-identity RHS at D=11008 allocates tens of GB of solve temps).
    A failed (non-PD) factorization yields NaNs, driving the retry loop.
    """
    d = h.shape[0]
    hf = h[::-1, ::-1]
    u_prime = jax.lax.linalg.cholesky(hf, symmetrize_input=False)[::-1, ::-1]

    n_chunks = -(-d // chunk)
    pad = n_chunks * chunk - d
    rows = jnp.arange(d)

    def solve_chunk(ci):
        cols = ci * chunk + jnp.arange(chunk)
        eye_blk = (rows[:, None] == cols[None, :]).astype(h.dtype)
        return jax.lax.linalg.triangular_solve(
            u_prime, eye_blk, left_side=True, lower=False)

    blocks = jax.lax.map(solve_chunk, jnp.arange(n_chunks))  # (n, d, chunk)
    u = jnp.transpose(blocks, (1, 0, 2)).reshape(d, n_chunks * chunk)
    return u[:, :d] if pad else u


@functools.partial(jax.jit, static_argnames=("chunk",))
def _damp_factor_check(h, damp, chunk: int = 2048):
    """One retry attempt fused into a single dispatch: damp, factorize, and
    reduce the NaN check to one scalar — one host readback per attempt
    (tunnel RTT dominates; the reference-style two separate checks cost two
    round trips each, gptq_py.py:57-65)."""
    hd = _add_damp(h, damp)
    u = _chol_inv_upper(hd, chunk)
    return u, hd, jnp.logical_not(jnp.any(jnp.isnan(u)))


def invert(
    state: HessianState,
    damp_ratio: float = 1e-2,
    act_order: bool = True,
    max_try: int = 100,
) -> InvertedHessian:
    """Scale, repair, permute, damp, and factorize the Hessian.

    Mirrors reference ``HessianHook.invert`` (gptq_py.py:39-66): the damp is
    added *cumulatively* until the factorization is NaN-free (host-side
    retry loop, like the reference's; a traced while_loop kept every
    attempt's buffers live and OOM'd at D=11008).  Raises if the Cholesky
    never succeeds within ``max_try`` dampening rounds.
    """
    h, damp, perm, perm_inv = _prepare(
        state.hessian, state.n_samples, jnp.float32(damp_ratio), act_order)
    for _ in range(max_try):
        hinv, h, ok = _damp_factor_check(h, damp)
        if bool(ok):
            return InvertedHessian(hessian=h, hessian_inv=hinv,
                                   perm=perm, perm_inv=perm_inv)
    raise FloatingPointError(
        f"Hessian inversion failed after {max_try} dampening rounds")
