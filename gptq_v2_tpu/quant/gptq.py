"""GPTQ solver: column-wise quantization with error feedback.

Re-implements the semantics of the reference solver (``gptq_py.py:69-251``)
as a jit-compiled ``lax.scan`` program — the TPU-native replacement for the
reference's serial CUDA column loop (``gptq_cpp.cpp:51-84``,
``gptq_cpp_kernel.cu:21-158``):

* outer ``lax.scan`` over groups (static count, dynamic slicing — one
  compilation regardless of C), inner ``lax.scan`` over the columns of a
  group performing quantize → error → masked rank-1 update in registers/VMEM,
* the block-tail update ``W[:, i2:] -= E_blk @ Hinv[i1:i2, i2:]`` runs as a
  single masked full-width MXU matmul per group,
* error feedback optionally round-trips the dequantized value through a
  low-precision dtype (fp16 by default) so the stored error matches
  inference numerics exactly — the TPU equivalent of the reference's
  ``__float2half_rn`` round trip (``gptq_cpp_kernel.cu:55-66``),
* RTN path (no Hessian) vectorizes find-params/quantize over *all* groups in
  one shot (reference gptq_py.py:101-124 loops per group).

GPTQ is row-independent, so callers may stack several same-input layers
(e.g. q/k/v) along the row axis and solve them in one call — fewer, larger
TPU ops than the reference's per-layer loop.

Blocked updates default to ``gptq_block == group`` (the only configuration
the reference ever runs: ``llama.py:146-161`` passes
``gptq_block_sizes=group_sizes``); the general path — non-uniform group
sizes and/or block boundaries decoupled from group boundaries, reference
``gptq_py.py:158-193`` — is :func:`_solve_blocked`, which reproduces the
reference's exact update schedule: ``find_params`` reads the *outer*
weight (updated by previous blocks' tail updates only, never by in-block
rank-1 updates), MSE refinement reads the current *block* slice, and a
group spanning a block boundary carries its quantizer across it.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.quant import quantizer as qz
from gptq_v2_tpu.quant.hessian import InvertedHessian

_HIGHEST = jax.lax.Precision.HIGHEST


def _find_params_maxq(x, maxq, sym: bool, scale_bits: Optional[int]):
    """find_params with a traced ``maxq`` (per-group mixed bit widths)."""
    if scale_bits is not None and scale_bits > 0:
        sym = True
    if sym:
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = absmax * (2.0 / maxq) + qz.EPSILON
        qzero = jnp.full_like(scale, jnp.round((maxq + 1.0) * 0.5))
        if scale_bits is not None and scale_bits > 0:
            smaxq = jnp.asarray(2.0 ** float(scale_bits) - 1.0, dtype=x.dtype)
            sscale = jnp.max(scale, axis=-2, keepdims=True) / (smaxq + 1.0) ** 2.0 + qz.EPSILON
            qscale = qz.quantize2(scale, sscale, smaxq)
            scale = qz.dequantize2(qscale, sscale)
            return qz.QuantParams(scale, qzero, maxq, qscale, sscale, smaxq)
        return qz.QuantParams(scale, qzero, maxq)
    x_max = jax.nn.relu(jnp.max(x, axis=-1, keepdims=True))
    x_min = -jax.nn.relu(-jnp.min(x, axis=-1, keepdims=True))
    scale = (x_max - x_min) / maxq + qz.EPSILON
    qzero = jnp.round(-x_min / scale)
    return qz.QuantParams(scale, qzero, maxq)


def _feedback_dequantize(q, scale, qzero, fb_dtype):
    """Dequantize for error feedback, optionally via low-precision round trip.

    ``fb_dtype=float16`` reproduces the reference kernel's half round trip
    (gptq_cpp_kernel.cu:55-66); ``None`` reproduces the reference pure-Python
    path (quant.py:22-30, full fp32).  ``bfloat16`` matches TPU inference.
    """
    if fb_dtype is None:
        return (q - qzero) * scale
    lo = lambda v: v.astype(fb_dtype)
    return ((lo(q) - lo(qzero)) * lo(scale)).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "sym", "scale_bits", "fb_dtype_name",
                     "mse", "mse_max_shrink", "mse_n_grid", "mse_norm"),
)
def _solve_uniform(
    weight,  # (R, C) fp32, already act-order permuted
    hinv,  # (C, C) fp32 upper Cholesky factor of H⁻¹
    maxq_per_group,  # (G,) fp32
    group_size: int,
    sym: bool,
    scale_bits: Optional[int],
    fb_dtype_name: Optional[str],
    mse: bool,
    mse_max_shrink: float,
    mse_n_grid: int,
    mse_norm: float,
):
    R, C = weight.shape
    g = group_size
    G = C // g
    fb_dtype = jnp.dtype(fb_dtype_name) if fb_dtype_name else None
    col_ids = jnp.arange(C)

    def group_body(w_full, gi):
        i1 = gi * g
        wblk = jax.lax.dynamic_slice(w_full, (0, i1), (R, g))
        hblk = jax.lax.dynamic_slice(hinv, (i1, i1), (g, g))
        params = _find_params_maxq(wblk, maxq_per_group[gi], sym, scale_bits)
        if mse:
            params = qz.mse_refine(params, wblk, mse_max_shrink, mse_n_grid, mse_norm)
        scale, qzero, maxq = params.scale, params.qzero, params.maxq

        jidx = jnp.arange(g)

        def col_body(wb, j):
            w_j = jax.lax.dynamic_slice(wb, (0, j), (R, 1))
            q_j = jnp.clip(jnp.round(w_j / scale) + qzero, 0.0, maxq)
            dq_j = _feedback_dequantize(q_j, scale, qzero, fb_dtype)
            err_j = (w_j - dq_j) / hblk[j, j]
            # Rank-1 update of the in-block suffix; the quantized column j
            # itself is deliberately not updated (reference gptq_py.py:191-192).
            hrow = jnp.where(jidx > j, hblk[j, :], 0.0)[None, :]  # (1, g)
            wb = wb - err_j * hrow
            return wb, (q_j[:, 0], dq_j[:, 0], err_j[:, 0])

        _, (q_cols, dq_cols, err_cols) = jax.lax.scan(col_body, wblk, jidx)
        # q_cols etc: (g, R) stacked in column order.

        # Block-tail update over all remaining columns as one MXU matmul,
        # masked so columns < i2 (incl. the block itself) are untouched.
        hrows = jax.lax.dynamic_slice(hinv, (i1, 0), (g, C))  # (g, C)
        hrows = jnp.where(col_ids[None, :] >= i1 + g, hrows, 0.0)
        w_full = w_full - jax.lax.dot_general(
            err_cols, hrows,  # (g, R)ᵀ @ (g, C) contract over g
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_HIGHEST,
            preferred_element_type=jnp.float32,
        )
        aux = (scale[:, 0], qzero[:, 0])
        if scale_bits is not None:
            aux = aux + (params.qscale[:, 0], params.sscale[0, 0])
        return w_full, ((q_cols, dq_cols, err_cols),) + aux

    _, outs = jax.lax.scan(group_body, weight, jnp.arange(G))
    (q_all, dq_all, err_all) = outs[0]  # each (G, g, R)

    def to_rc(a):  # (G, g, R) -> (R, C) in permuted column order
        return jnp.transpose(a, (2, 0, 1)).reshape(R, C)

    result = {
        "qweight": to_rc(q_all),
        "quant": to_rc(dq_all),
        "error": to_rc(err_all),
        "scale": outs[1].T,  # (R, G)
        "qzero": outs[2].T,  # (R, G)
    }
    if scale_bits is not None:
        result["qscale"] = outs[3].T
        result["sscale"] = outs[4]  # (G,)
    return result


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "sym", "scale_bits",
                     "mse", "mse_max_shrink", "mse_n_grid", "mse_norm"),
)
def _rtn_uniform(weight, maxq_per_group, group_size, sym, scale_bits,
                 mse, mse_max_shrink, mse_n_grid, mse_norm):
    """Round-to-nearest over all groups at once (no Hessian).

    Reference gptq_py.py:101-124, vectorized: reshape (R, C) → (G, R, g) so
    one reduction finds every group's parameters simultaneously.
    """
    R, C = weight.shape
    g = group_size
    G = C // g
    w = jnp.transpose(weight.reshape(R, G, g), (1, 0, 2))  # (G, R, g)
    maxq = maxq_per_group[:, None, None]
    params = _find_params_maxq(w, maxq, sym, scale_bits)
    if mse:
        params = qz.mse_refine(params, w, mse_max_shrink, mse_n_grid, mse_norm)
    q = qz.params_quantize(params, w)
    dq = qz.params_dequantize(params, q)

    def to_rc(a):  # (G, R, g) -> (R, C)
        return jnp.transpose(a, (1, 0, 2)).reshape(R, C)

    result = {
        "qweight": to_rc(q),
        "quant": to_rc(dq),
        "scale": params.scale[:, :, 0].T,  # (R, G)
        "qzero": params.qzero[:, :, 0].T,
    }
    if scale_bits is not None:
        result["qscale"] = params.qscale[:, :, 0].T
        result["sscale"] = params.sscale[:, 0, 0]
    return result


@functools.partial(
    jax.jit,
    static_argnames=("group_sizes", "group_bit_widths", "block_sizes", "sym",
                     "scale_bits", "fb_dtype_name", "mse", "mse_max_shrink",
                     "mse_n_grid", "mse_norm"),
)
def _solve_blocked(
    weight,  # (R, C) fp32, already act-order permuted
    hinv,  # (C, C) fp32 upper Cholesky factor of H⁻¹
    group_sizes: tuple,  # static, need not be uniform
    group_bit_widths: tuple,  # static, per group
    block_sizes: tuple,  # static, decoupled from group boundaries
    sym: bool,
    scale_bits: Optional[int],
    fb_dtype_name: Optional[str],
    mse: bool,
    mse_max_shrink: float,
    mse_n_grid: int,
    mse_norm: float,
):
    """General GPTQ solve: arbitrary group sizes and block boundaries.

    Reproduces the reference's pure-Python general path exactly
    (``gptq_py.py:158-193``): block ids from ``gptq_block_sizes``, a new
    quantizer created at each group-start column from the *outer* weight
    (which carries previous blocks' tail updates but never in-block rank-1
    updates), MSE refinement on the current *block* slice, quantization of
    the in-block running weight, rank-1 update of the in-block suffix, and
    one tail matmul per block over the remaining columns.  Groups may span
    block boundaries (the quantizer carries across).  Blocks are unrolled
    in Python (static boundaries); columns run in ``lax.scan``.
    """
    R, C = weight.shape
    fb_dtype = jnp.dtype(fb_dtype_name) if fb_dtype_name else None
    group_ids = np.concatenate([[0], np.cumsum(group_sizes)])
    block_ids = np.concatenate([[0], np.cumsum(block_sizes)])
    assert group_ids[-1] == C and block_ids[-1] == C, (group_sizes, block_sizes, C)
    G = len(group_sizes)
    col_ids = jnp.arange(C)

    w = weight
    params_per_group: list = [None] * G
    q_parts, dq_parts, err_parts = [], [], []

    def _col_of_group(j):  # group index owning column j
        return int(np.searchsorted(group_ids, j, side="right") - 1)

    for i1, i2 in zip(block_ids[:-1], block_ids[1:]):
        blk = int(i2 - i1)
        # quantizers whose group starts inside this block: find_params on
        # the outer weight's group slice (reference gptq_py.py:168-186)
        for gi in range(G):
            gs, ge = int(group_ids[gi]), int(group_ids[gi + 1])
            if i1 <= gs < i2:
                maxq = jnp.asarray(2.0 ** group_bit_widths[gi] - 1.0, jnp.float32)
                p = _find_params_maxq(w[:, gs:ge], maxq, sym, scale_bits)
                if mse:
                    p = qz.mse_refine(p, w[:, i1:i2], mse_max_shrink,
                                      mse_n_grid, mse_norm)
                params_per_group[gi] = p

        # per-column parameter tables for the block (params are fixed per
        # group, so this is a static gather of (R,1) tensors)
        gidx = [_col_of_group(j) for j in range(i1, i2)]
        scale_cols = jnp.concatenate(
            [params_per_group[gi].scale for gi in gidx], axis=1)  # (R, blk)
        qzero_cols = jnp.concatenate(
            [params_per_group[gi].qzero for gi in gidx], axis=1)
        maxq_cols = jnp.asarray(
            [2.0 ** group_bit_widths[gi] - 1.0 for gi in gidx], jnp.float32)

        wblk = w[:, i1:i2]
        hblk = hinv[i1:i2, i1:i2]
        jidx = jnp.arange(blk)

        def col_body(wb, j, scale_cols=scale_cols, qzero_cols=qzero_cols,
                     maxq_cols=maxq_cols, hblk=hblk, jidx=jidx):
            w_j = jax.lax.dynamic_slice(wb, (0, j), (R, 1))
            s_j = jax.lax.dynamic_slice(scale_cols, (0, j), (R, 1))
            z_j = jax.lax.dynamic_slice(qzero_cols, (0, j), (R, 1))
            q_j = jnp.clip(jnp.round(w_j / s_j) + z_j, 0.0, maxq_cols[j])
            dq_j = _feedback_dequantize(q_j, s_j, z_j, fb_dtype)
            err_j = (w_j - dq_j) / hblk[j, j]
            hrow = jnp.where(jidx > j, hblk[j, :], 0.0)[None, :]
            wb = wb - err_j * hrow
            return wb, (q_j[:, 0], dq_j[:, 0], err_j[:, 0])

        _, (q_cols, dq_cols, err_cols) = jax.lax.scan(col_body, wblk, jidx)

        hrows = jnp.where(col_ids[None, :] >= i2, hinv[i1:i2, :], 0.0)
        w = w - jax.lax.dot_general(
            err_cols, hrows, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32,
        )
        q_parts.append(q_cols)
        dq_parts.append(dq_cols)
        err_parts.append(err_cols)

    def to_rc(parts):  # list of (blk, R) -> (R, C)
        return jnp.concatenate([p.T for p in parts], axis=1)

    result = {
        "qweight": to_rc(q_parts),
        "quant": to_rc(dq_parts),
        "error": to_rc(err_parts),
        # ragged groups: per-group params are (R, 1); stack to (R, G)
        "scale": jnp.concatenate([p.scale for p in params_per_group], axis=1),
        "qzero": jnp.concatenate([p.qzero for p in params_per_group], axis=1),
    }
    if scale_bits is not None:
        result["qscale"] = jnp.concatenate(
            [p.qscale for p in params_per_group], axis=1)
        result["sscale"] = jnp.concatenate(
            [p.sscale[0] for p in params_per_group], axis=0)
    return result


@functools.partial(
    jax.jit,
    static_argnames=("group_sizes", "group_bit_widths", "sym", "scale_bits",
                     "mse", "mse_max_shrink", "mse_n_grid", "mse_norm"),
)
def _rtn_general(weight, group_sizes: tuple, group_bit_widths: tuple, sym,
                 scale_bits, mse, mse_max_shrink, mse_n_grid, mse_norm):
    """RTN with non-uniform group sizes: per-group slices, unrolled
    (reference gptq_py.py:101-124's loop, which never assumes uniformity)."""
    group_ids = np.concatenate([[0], np.cumsum(group_sizes)])
    q_parts, dq_parts, scales, qzeros, qscales, sscales = [], [], [], [], [], []
    for gi, (i1, i2) in enumerate(zip(group_ids[:-1], group_ids[1:])):
        wg = weight[:, int(i1):int(i2)]
        maxq = jnp.asarray(2.0 ** group_bit_widths[gi] - 1.0, jnp.float32)
        p = _find_params_maxq(wg, maxq, sym, scale_bits)
        if mse:
            p = qz.mse_refine(p, wg, mse_max_shrink, mse_n_grid, mse_norm)
        q = qz.params_quantize(p, wg)
        q_parts.append(q)
        dq_parts.append(qz.params_dequantize(p, q))
        scales.append(p.scale)
        qzeros.append(p.qzero)
        if scale_bits is not None:
            qscales.append(p.qscale)
            sscales.append(p.sscale[0])
    result = {
        "qweight": jnp.concatenate(q_parts, axis=1),
        "quant": jnp.concatenate(dq_parts, axis=1),
        "scale": jnp.concatenate(scales, axis=1),
        "qzero": jnp.concatenate(qzeros, axis=1),
    }
    if scale_bits is not None:
        result["qscale"] = jnp.concatenate(qscales, axis=1)
        result["sscale"] = jnp.concatenate(sscales, axis=0)
    return result


def gptq_quant(
    weight: jax.Array,  # (R=out_features, C=in_features)
    inverted: Optional[InvertedHessian],
    group_sizes: Sequence[int],
    group_bit_widths: Sequence[int],
    scale_bit_width: Optional[int] = None,
    quant_symmetric: bool = False,
    quant_mse: bool = False,
    quant_max_shrink: float = 0.8,
    quant_n_grid: int = 100,
    quant_norm: float = 2.4,
    feedback_dtype: Optional[str] = "float16",
    save_dtype=jnp.float16,
    use_solver_kernel: Optional[bool] = None,
    keep_on_device: bool = False,
    gptq_block_sizes: Optional[Sequence[int]] = None,
) -> dict:
    """Quantize one weight matrix. Returns ``{'quant_meta', 'metrics', 'quant'}``.

    API mirror of reference ``gptq_quant`` (gptq_py.py:69-251): per-group
    sizes/bit-widths, optional EXL2 scale quantization, optional MSE search,
    RTN fallback when ``inverted is None``.  ``quant_meta`` matches the
    reference schema and dtypes (gptq_py.py:240-250): uint8 ``qweight``/
    ``qzero``/``qscale``/``group_bit_widths``, int16 ``perm_inv``/
    ``group_sizes``, ``scale``/``sscale`` in ``save_dtype``.

    ``use_solver_kernel``: run the blocked Pallas solver
    (``ops/gptq_pallas.py``, the reference's CUDA ``gptq_use_kernel`` path,
    ~400x the scan solver on TPU).  Default: on TPU, whenever the config is
    kernel-eligible (uniform bits, no MSE search, no EXL2 scale
    quantization); the jnp scan solver remains the executable spec.

    ``keep_on_device``: leave the array-valued ``quant_meta`` fields as
    device arrays (already cast/reordered to their storage dtypes) instead
    of transferring them — callers overlap the device→host copies with
    later compute via ``copy_to_host_async`` (the pipeline does).
    """
    group_sizes = [int(s) for s in group_sizes]
    group_bit_widths = [int(b) for b in group_bit_widths]
    n_rows, n_cols = weight.shape
    assert sum(group_sizes) == n_cols, (group_sizes, n_cols)
    uniform = len(set(group_sizes)) == 1
    g = group_sizes[0]
    if gptq_block_sizes is None:
        gptq_block_sizes = group_sizes  # reference default (llama.py:146-161)
    gptq_block_sizes = [int(s) for s in gptq_block_sizes]
    assert sum(gptq_block_sizes) == n_cols, (gptq_block_sizes, n_cols)
    blocks_eq_groups = gptq_block_sizes == group_sizes

    weight_ref = weight
    w32 = weight.astype(jnp.float32)

    perm = perm_inv = None
    if inverted is not None:
        if inverted.perm is not None:
            perm = inverted.perm
            perm_inv = inverted.perm_inv
            w32 = jnp.take(w32, perm, axis=1)
        # Note: the reference's post-invert dead-column zeroing
        # (gptq_py.py:95-96) is a no-op — invert() has already repaired and
        # damped the diagonal, so no diag entry is 0. We skip it.

    maxq_arr = jnp.asarray([2.0 ** b - 1.0 for b in group_bit_widths], dtype=jnp.float32)
    common = dict(
        sym=quant_symmetric,
        scale_bits=scale_bit_width,
        mse=quant_mse,
        mse_max_shrink=quant_max_shrink,
        mse_n_grid=quant_n_grid,
        mse_norm=quant_norm,
    )
    kernel_eligible = (
        inverted is not None
        and not quant_mse
        and scale_bit_width is None
        and len(set(group_bit_widths)) == 1
        and uniform
        and blocks_eq_groups
    )
    # Configs the monolithic kernel can't take (MSE grid search, EXL2 scale
    # quantization, mixed per-group bit widths) run the group-stepped Pallas
    # solver: find_params in jnp between per-group kernels, one jit program.
    stepped_eligible = (
        inverted is not None and uniform and blocks_eq_groups
        and not kernel_eligible
    )
    if use_solver_kernel is None:
        use_solver_kernel = ((kernel_eligible or stepped_eligible)
                             and jax.default_backend() == "tpu")

    if inverted is None:
        if uniform:
            out = _rtn_uniform(w32, maxq_arr, group_size=g, **common)
        else:
            out = _rtn_general(w32, tuple(group_sizes),
                               tuple(group_bit_widths), **common)
        error_sq_mean = jnp.zeros((), dtype=jnp.float32)
        gptq_norm_src = out["quant"] * 0.0  # reference uses `error` here (0-init path)
    else:
        if use_solver_kernel and kernel_eligible:
            from gptq_v2_tpu.ops.gptq_pallas import gptq_solve

            out = gptq_solve(
                w32.T, inverted.hessian_inv, g, 2.0 ** group_bit_widths[0] - 1.0,
                sym=quant_symmetric, feedback_dtype=feedback_dtype,
            )
        elif use_solver_kernel and stepped_eligible:
            from gptq_v2_tpu.ops.gptq_pallas import gptq_solve_stepped

            out = gptq_solve_stepped(
                w32.T, inverted.hessian_inv, g, tuple(group_bit_widths),
                sym=quant_symmetric, scale_bits=scale_bit_width,
                mse=quant_mse, mse_max_shrink=quant_max_shrink,
                mse_n_grid=quant_n_grid, mse_norm=quant_norm,
                feedback_dtype=feedback_dtype,
            )
        elif uniform and blocks_eq_groups:
            out = _solve_uniform(
                w32, inverted.hessian_inv, maxq_arr, group_size=g,
                fb_dtype_name=feedback_dtype, **common,
            )
        else:
            out = _solve_blocked(
                w32, inverted.hessian_inv, tuple(group_sizes),
                tuple(group_bit_widths), tuple(gptq_block_sizes),
                fb_dtype_name=feedback_dtype, **common,
            )
        # the kernel reports mean(err²) directly (it never materializes the
        # full error matrix); the jnp path returns the matrix
        error_sq_mean = (out["error_sq_mean"] if "error_sq_mean" in out
                         else jnp.mean(out["error"].astype(jnp.float32) ** 2.0))
        gptq_norm_src = weight_ref.astype(jnp.float32) / jnp.diagonal(inverted.hessian_inv)

    quant_perm_order = out["quant"]  # (R, C) in act-order column order
    quant_orig = (
        jnp.take(quant_perm_order, perm_inv, axis=1) if perm_inv is not None
        else quant_perm_order
    )
    w_ref32 = weight_ref.astype(jnp.float32)
    # as device scalars when keep_on_device (a float() here would block the
    # dispatch queue on the whole solve; the pipeline collects at block end)
    wrap = (lambda a: a) if keep_on_device else float
    metrics = {
        "gptq_error": wrap(error_sq_mean),
        "gptq_norm": wrap(jnp.mean(gptq_norm_src ** 2.0)),
        "l2_error": wrap(jnp.mean(jnp.abs(quant_orig - w_ref32) ** 2.0)),
        "l2_norm": wrap(jnp.mean(jnp.abs(w_ref32) ** 2.0)),
    }

    n_groups = len(group_sizes)
    # Group re-sort by (bit_width, group_size) when scale quantization is on
    # (reference gptq_py.py:202-212). Identity otherwise.
    order = list(range(n_groups))
    if scale_bit_width is not None:
        order.sort(key=lambda ig: (group_bit_widths[ig], group_sizes[ig], -ig), reverse=True)
    group_ids = np.concatenate([[0], np.cumsum(group_sizes)])
    col_order = np.concatenate(
        [np.arange(group_ids[ig], group_ids[ig + 1], dtype=np.int64)
         for ig in order]
    )

    def host(a):
        # cast/reorder on device first: the solver outputs are f32, and
        # host transfers cost bytes (bf16 additionally takes a slow
        # conversion path) — ship uint8/f16 bits, not f32
        if keep_on_device:
            return a
        if a.dtype == jnp.bfloat16:
            bits = jax.lax.bitcast_convert_type(a, jnp.uint16)
            import ml_dtypes

            return np.asarray(jax.device_get(bits)).view(ml_dtypes.bfloat16)
        return np.asarray(jax.device_get(a))

    col_order_d = jnp.asarray(col_order)
    order_d = jnp.asarray(np.asarray(order, dtype=np.int64))
    qweight = host(jnp.take(out["qweight"].astype(jnp.uint8), col_order_d, axis=1))
    scale = host(jnp.take(out["scale"].astype(save_dtype), order_d, axis=1))
    qzero = host(jnp.take(out["qzero"].astype(jnp.uint8), order_d, axis=1))
    if perm is not None:
        perm_np = np.asarray(jax.device_get(perm)).astype(np.int16)[col_order]
    else:
        perm_np = np.arange(n_cols, dtype=np.int16)[col_order]
    perm_inv_np = np.argsort(perm_np).astype(np.int16)

    quant_meta = {
        "qweight": qweight,  # (R, C) codes, in stored (permuted) column order
        "scale": scale,  # (R, G)
        "qzero": qzero,  # (R, G)
        "qscale": (host(jnp.take(out["qscale"].astype(jnp.uint8), order_d, axis=1))
                   if scale_bit_width is not None else None),
        "sscale": (host(jnp.take(out["sscale"].astype(save_dtype), order_d, axis=0))
                   if scale_bit_width is not None else None),
        "perm": perm_np,  # (C,) stored-column -> original-column map
        "perm_inv": perm_inv_np,  # (C,) original-column -> stored-column map
        "group_sizes": np.asarray(group_sizes, dtype=np.int16)[order],
        "group_bit_widths": np.asarray(group_bit_widths, dtype=np.uint8)[order],
        "scale_bit_width": (
            np.asarray(scale_bit_width, dtype=np.uint8) if scale_bit_width is not None else None
        ),
    }
    return {"quant_meta": quant_meta, "metrics": metrics, "quant": quant_orig}
