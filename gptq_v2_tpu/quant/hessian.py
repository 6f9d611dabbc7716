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


def _cholesky_inv_upper(h: jax.Array) -> jax.Array:
    """Upper Cholesky factor ``U`` of ``H⁻¹`` (``H⁻¹ = UᵀU``).

    Same chain as reference gptq_py.py:59-61:
    ``L = chol(H)``; ``H⁻¹ = cho_solve(L, I)``; ``U = chol(H⁻¹)ᵀ``.
    A failed (non-PD) factorization yields NaNs, which drives the retry loop.
    """
    eye = jnp.eye(h.shape[0], dtype=h.dtype)
    chol_l = jax.lax.linalg.cholesky(h, symmetrize_input=False)
    h_inv = jax.scipy.linalg.cho_solve((chol_l, True), eye)
    # chol of H⁻¹ gives lower M with H⁻¹ = M Mᵀ; U = Mᵀ is upper with UᵀU = H⁻¹.
    return jax.lax.linalg.cholesky(h_inv, symmetrize_input=True).T


@functools.partial(jax.jit, static_argnames=("act_order", "max_try"))
def _invert_impl(hessian, n_samples, damp_ratio, act_order: bool, max_try: int):
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

    def cond(carry):
        tries, _, hinv = carry
        return jnp.logical_and(tries < max_try, jnp.any(jnp.isnan(hinv)))

    def body(carry):
        tries, h_cur, _ = carry
        h_next = h_cur.at[didx, didx].add(damp)  # damp accumulates across tries
        return tries + 1, h_next, _cholesky_inv_upper(h_next)

    nan_init = jnp.full_like(h, jnp.nan)
    tries, h_final, hinv = jax.lax.while_loop(cond, body, (0, h, nan_init))
    return h_final, hinv, perm, perm_inv, tries


def invert(
    state: HessianState,
    damp_ratio: float = 1e-2,
    act_order: bool = True,
    max_try: int = 100,
) -> InvertedHessian:
    """Scale, repair, permute, damp, and factorize the Hessian.

    Mirrors reference ``HessianHook.invert`` (gptq_py.py:39-66).  Raises if
    the Cholesky never succeeds within ``max_try`` dampening rounds.
    """
    h, hinv, perm, perm_inv, tries = _invert_impl(
        state.hessian, state.n_samples, jnp.float32(damp_ratio), act_order, max_try
    )
    if bool(jnp.any(jnp.isnan(hinv))):
        raise FloatingPointError(
            f"Hessian inversion failed after {int(tries)} dampening rounds"
        )
    return InvertedHessian(hessian=h, hessian_inv=hinv, perm=perm, perm_inv=perm_inv)
