"""Pallas blocked GPTQ solver kernel.

TPU-native equivalent of the reference's exllamav2-derived CUDA column loop
(reference ``gptq_cpp.cpp:33-84``, ``gptq_cpp_kernel.cu:21-158``), replacing
its worst inefficiency — 128 serial tiny kernel launches per group — with
one fused kernel: the whole group's column loop runs in VMEM, and the
full-width block-tail update is a single MXU matmul per group.  It is also
~400x faster than the ``lax.scan`` jnp solver (``quant/gptq.py``), whose
4096 sequential XLA loop iterations are latency-bound on TPU.

Row independence: GPTQ treats weight rows independently, so the grid tiles
R over lanes (transposed ``(C, R)`` layout, like the reference kernels) and
each tile runs all groups sequentially with its weight block resident.

Column recurrence without rank-1 updates: after columns ``0..j-1`` of a
group, the current value of column ``j`` is
``w_j = w0_j - hblk[:, j] . E``  (E = error rows so far, zero beyond j-1),
so each iteration is one ``(1, g) x (g, Rt)`` MXU dot plus scalar math —
no in-place weight-tile updates, no per-iteration transposes.

fp16 error-feedback round trip (the reference's ``__float2half_rn``,
``gptq_cpp_kernel.cu:55-66``) is emulated with integer round-to-nearest-even
on the f32 mantissa (Mosaic cannot cast to f16): exact for values normal in
f16; f16-denormal magnitudes (<6.1e-5) keep extra mantissa bits.

jnp twin for tests: ``quant.gptq._solve_uniform``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_v2_tpu.quant.quantizer import EPSILON

_HIGHEST = jax.lax.Precision.HIGHEST


def _f16_roundtrip(v: jax.Array) -> jax.Array:
    """Round f32 to the nearest f16-representable value (RNE), in f32.

    Integer RNE on the 13 mantissa bits f16 drops.  Mantissa overflow
    carries into the exponent, which is exactly IEEE round-up behaviour.
    Values beyond f16 range saturate to ±inf, f16-denormal magnitudes
    (<2^-14) round to the denormal grid (multiples of 2^-24), and
    non-finite inputs pass through — matching ``astype(float16)``.
    """
    u = jax.lax.bitcast_convert_type(v, jnp.int32)
    half = jnp.int32(0x0FFF)
    lsb = (u >> 13) & 1
    r = (u + half + lsb) & jnp.int32(~0x1FFF)
    rounded = jax.lax.bitcast_convert_type(r, jnp.float32)
    sign = jnp.where(v < 0, -1.0, 1.0).astype(jnp.float32)
    rounded = jnp.where(jnp.abs(rounded) > 65504.0,
                        sign * jnp.float32(jnp.inf), rounded)
    # denormal grid: jnp.round is round-half-even, like the hardware cast
    denorm = jnp.round(v * jnp.float32(2.0 ** 24)) * jnp.float32(2.0 ** -24)
    rounded = jnp.where(jnp.abs(v) < jnp.float32(2.0 ** -14), denorm, rounded)
    return jnp.where(jnp.isfinite(v), rounded, v)


def _feedback_dq(q_minus_z: jax.Array, scale: jax.Array,
                 fb: Optional[str]) -> jax.Array:
    """(q - z) * s through the feedback dtype, matching the jnp twin
    ``quant.gptq._feedback_dequantize`` operand-for-operand: the scale is
    rounded to the feedback dtype *before* the multiply, and the product is
    rounded after.  ``q - z`` is integral and exact in every dtype here;
    the f32 product of f16 operands is exact (<= 19 mantissa bits), so one
    final RNE equals a native f16 multiply."""
    if fb is None:
        return q_minus_z * scale
    if fb == "float16":
        return _f16_roundtrip(q_minus_z * _f16_roundtrip(scale))
    dt = jnp.dtype(fb)
    return (q_minus_z.astype(dt) * scale.astype(dt)).astype(jnp.float32)


def _tail_chunk(c_total: int, g: int, target: int = 4096) -> int:
    """Largest multiple of ``g`` dividing ``c_total`` and <= ``target``."""
    n_groups = c_total // g
    best = 1
    for k in range(1, min(n_groups, target // g) + 1):
        if n_groups % k == 0:
            best = k
    return best * g


def _kernel(w_ref, hblk_ref, hblkT_ref, hinvT_ref,
            q_ref, err2_ref, sc_ref, zr_ref,
            w0_scr, hb_scr, hbT_scr, hd_scr, e_scr, q_scr,
            *, group_size, n_groups, maxq, sym, fb):
    g = group_size
    gi = pl.program_id(1)
    i1 = gi * g
    wout_ref = w_ref  # aliased in/out (VMEM: one resident W block, not two)

    w0_scr[:] = wout_ref[pl.ds(i1, g), :]  # (g, Rt) current block
    hb_scr[:] = hblk_ref[0]
    hbT_scr[:] = hblkT_ref[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1))
    hd_scr[:] = jnp.sum(jnp.where(eye, hb_scr[:], 0.0), axis=1, keepdims=True)
    e_scr[:] = jnp.zeros_like(e_scr)

    # find_params on the pre-loop block (reference quant.py:89-118)
    w0 = w0_scr[:]
    if sym:
        absmax = jnp.max(jnp.abs(w0), axis=0, keepdims=True)
        # 2/maxq must be computed in f32 (not folded in Python doubles) to
        # match the jnp twin's rounding boundaries exactly
        scale = absmax * (jnp.float32(2.0) / jnp.float32(maxq)) + EPSILON
        qzero = jnp.full_like(scale, round((maxq + 1.0) / 2.0))
    else:
        x_max = jnp.maximum(jnp.max(w0, axis=0, keepdims=True), 0.0)
        x_min = jnp.minimum(jnp.min(w0, axis=0, keepdims=True), 0.0)
        scale = (x_max - x_min) / maxq + EPSILON
        qzero = jnp.round(-x_min / scale)

    def col(j, _):
        corr = jax.lax.dot_general(
            hbT_scr[pl.ds(j, 1), :], e_scr[:],  # hblk[:, j] . E
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        w_j = w0_scr[pl.ds(j, 1), :] - corr  # (1, Rt)
        # true division (not *reciprocal): rounding boundaries must match
        # the jnp twin bit-for-bit
        q_j = jnp.clip(jnp.round(w_j / scale) + qzero, 0.0, maxq)
        dq = _feedback_dq(q_j - qzero, scale, fb)
        hjj = hd_scr[pl.ds(j, 1), :]  # (1, 1)
        e_j = (w_j - dq) / hjj
        q_scr[pl.ds(j, 1), :] = q_j
        e_scr[pl.ds(j, 1), :] = e_j
        return 0

    jax.lax.fori_loop(0, g, col, 0, unroll=False)

    # block-tail update: W[i2:, :] -= hinvT[i2:, group] @ E, chunked over C
    # so temporaries stay a few MB at 70B feature dims (an unchunked
    # (C, Rt) masked dot spilled ~50MB of vregs at C=28672)
    c_total = hinvT_ref.shape[1]
    chunk = _tail_chunk(c_total, g)
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def tail(ci, _):
        c0 = ci * chunk
        hseg = hinvT_ref[0, pl.ds(c0, chunk), :]  # (chunk, g)
        upd = jax.lax.dot_general(
            hseg, e_scr[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        keep = (rows0 + c0) >= (i1 + g)
        seg = wout_ref[pl.ds(c0, chunk), :]
        wout_ref[pl.ds(c0, chunk), :] = seg - jnp.where(keep, upd, 0.0)
        return 0

    jax.lax.fori_loop(0, c_total // chunk, tail, 0, unroll=False)

    q_ref[pl.ds(i1, g), :] = q_scr[:]
    # per-group squared-error sums (metrics need only the mean; a full
    # (C, Rt) error output would cost two more resident VMEM blocks)
    err2_ref[pl.ds(gi, 1), :] = jnp.sum(e_scr[:] * e_scr[:], axis=0,
                                        keepdims=True)
    sc_ref[pl.ds(gi, 1), :] = scale
    zr_ref[pl.ds(gi, 1), :] = qzero


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "maxq", "sym", "fb", "block_r", "interpret"),
)
def _solve_pallas(weight_t, hinv, group_size: int, maxq: float, sym: bool,
                  fb: Optional[str], block_r: int, interpret: bool):
    """weight_t: (C, R) f32, act-order-permuted, transposed.
    hinv: (C, C) f32 upper Cholesky factor of H^-1.
    Returns (qweight_t, err_t, scale_t, qzero_t) in solver (stored) order.
    """
    c, r = weight_t.shape
    g = group_size
    n_groups = c // g
    # diagonal blocks of hinv, plus their transposes, gathered host-free
    gidx = jnp.arange(n_groups)
    hblocks = jax.vmap(
        lambda i: jax.lax.dynamic_slice(hinv, (i * g, i * g), (g, g)))(gidx)
    hblocksT = jnp.swapaxes(hblocks, 1, 2)
    # hinv^T stacked per group: [gi] = hinv[i1:i2, :]^T, shape (G, C, g) —
    # full-dim trailing block dims keep Mosaic's tiling contract for any g
    hinvT = jnp.transpose(hinv.reshape(n_groups, g, c), (0, 2, 1))

    rt = block_r
    r_pad = -(-r // rt) * rt
    if r_pad != r:
        weight_t = jnp.pad(weight_t, ((0, 0), (0, r_pad - r)))

    kernel = functools.partial(
        _kernel, group_size=g, n_groups=n_groups, maxq=maxq, sym=sym, fb=fb)
    grid = (r_pad // rt, n_groups)
    # NB: the kernel mutates its (revisited) W input block in VMEM as the
    # running weight state for the current lane tile; input blocks are never
    # flushed back to HBM and the next lane tile refetches pristine columns,
    # so no W output is needed — one resident (C, Rt) block instead of two.
    q_t, err2_t, sc_t, zr_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, rt), lambda rb, gi: (0, rb)),       # weight_t
            pl.BlockSpec((1, g, g), lambda rb, gi: (gi, 0, 0)),  # hblocks
            pl.BlockSpec((1, g, g), lambda rb, gi: (gi, 0, 0)),  # hblocksT
            pl.BlockSpec((1, c, g), lambda rb, gi: (gi, 0, 0)),  # hinvT
        ],
        out_specs=[
            pl.BlockSpec((c, rt), lambda rb, gi: (0, rb)),       # qweight_t
            pl.BlockSpec((n_groups, rt), lambda rb, gi: (0, rb)),  # err² sums
            pl.BlockSpec((n_groups, rt), lambda rb, gi: (0, rb)),  # scale_t
            pl.BlockSpec((n_groups, rt), lambda rb, gi: (0, rb)),  # qzero_t
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, r_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, rt), jnp.float32),   # w0
            pltpu.VMEM((g, g), jnp.float32),    # hblk
            pltpu.VMEM((g, g), jnp.float32),    # hblkT
            pltpu.VMEM((g, 1), jnp.float32),    # hdiag
            pltpu.VMEM((g, rt), jnp.float32),   # E
            pltpu.VMEM((g, rt), jnp.float32),   # q
        ],
        compiler_params=pltpu.CompilerParams(
            # resident W/q blocks are (C, Rt) f32 — beyond the default
            # 16MB scoped-vmem budget at 7B+ feature dims
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(weight_t, hblocks, hblocksT, hinvT)
    return q_t[:, :r], err2_t[:, :r], sc_t[:, :r], zr_t[:, :r]


def _kernel_step(i1_ref, w_ref, hblk_ref, hblkT_ref, hinvTg_ref, sc_ref,
                 zr_ref, mq_ref, w_out, q_out, err2_ref,
                 w0_scr, hd_scr, e_scr, q_scr, *, group_size, fb):
    """One GPTQ group step: column loop + tail update, with externally
    supplied quantization params (scale/qzero/maxq as inputs, not in-kernel
    find_params) — the worker kernel of :func:`gptq_solve_stepped`.

    ``w_ref``/``w_out`` are HBM-aliased (C, Rt) blocks: the tail-updated
    running weight flushes back between group calls so the host-side
    find_params (MSE grid / EXL2 / per-group maxq) can read the correct
    state for the next group — the same schedule as the reference's kernel
    path (find_params between ``gptq_quantize_range`` calls,
    reference ``gptq_py.py:125-157``).
    """
    g = group_size
    # the scalar input carries the GROUP INDEX; multiplying by the static
    # group size in-kernel lets Mosaic prove the slice start's alignment
    i1 = i1_ref[0] * g
    w0_scr[:] = w_ref[pl.ds(i1, g), :]  # (g, Rt) current block
    eye = (jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1))
    hd_scr[:] = jnp.sum(jnp.where(eye, hblk_ref[:], 0.0), axis=1,
                        keepdims=True)  # (g, 1) diag
    e_scr[:] = jnp.zeros_like(e_scr)
    scale = sc_ref[:]  # (1, Rt)
    qzero = zr_ref[:]
    maxq = mq_ref[0]

    def col(j, _):
        corr = jax.lax.dot_general(
            hblkT_ref[pl.ds(j, 1), :], e_scr[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        w_j = w0_scr[pl.ds(j, 1), :] - corr  # (1, Rt)
        q_j = jnp.clip(jnp.round(w_j / scale) + qzero, 0.0, maxq)
        dq = _feedback_dq(q_j - qzero, scale, fb)
        hjj = hd_scr[pl.ds(j, 1), :]  # (1, 1)
        e_j = (w_j - dq) / hjj
        q_scr[pl.ds(j, 1), :] = q_j
        e_scr[pl.ds(j, 1), :] = e_j
        return 0

    jax.lax.fori_loop(0, g, col, 0, unroll=False)

    # tail update: W_out = W - masked(hinv[group, :]^T @ E); whole block
    # rewritten (aliased buffer), chunked to bound temporaries
    c_total = hinvTg_ref.shape[0]
    chunk = _tail_chunk(c_total, g)
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def tail(ci, _):
        c0 = ci * chunk
        hseg = hinvTg_ref[pl.ds(c0, chunk), :]  # (chunk, g)
        upd = jax.lax.dot_general(
            hseg, e_scr[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        keep = (rows0 + c0) >= (i1 + g)
        seg = w_ref[pl.ds(c0, chunk), :]
        w_out[pl.ds(c0, chunk), :] = seg - jnp.where(keep, upd, 0.0)
        return 0

    jax.lax.fori_loop(0, c_total // chunk, tail, 0, unroll=False)
    q_out[:] = q_scr[:]
    err2_ref[:] = jnp.sum(e_scr[:] * e_scr[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("group_size", "fb", "block_r",
                                             "interpret"))
def _step_call(w, i1, hblk, hblkT, hinvTg, scale_row, qzero_row, maxq,
               group_size: int, fb: Optional[str], block_r: int,
               interpret: bool):
    """One Pallas group step over the full (C, R) weight; returns
    ``(w_updated, q_group (g, R), err2 (1, R))``.  One compilation serves
    every group (``i1`` is a scalar input)."""
    c, r = w.shape
    g = group_size
    rt = block_r
    grid = (r // rt,)
    kernel = functools.partial(_kernel_step, group_size=g, fb=fb)
    w_new, q_g, err2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # i1 (1,)
            pl.BlockSpec((c, rt), lambda rb: (0, rb)),           # W
            pl.BlockSpec((g, g), lambda rb: (0, 0)),             # hblk
            pl.BlockSpec((g, g), lambda rb: (0, 0)),             # hblkT
            pl.BlockSpec((c, g), lambda rb: (0, 0)),             # hinv[grp,:]^T
            pl.BlockSpec((1, rt), lambda rb: (0, rb)),           # scale
            pl.BlockSpec((1, rt), lambda rb: (0, rb)),           # qzero
            pl.BlockSpec(memory_space=pltpu.SMEM),               # maxq (1,)
        ],
        out_specs=[
            pl.BlockSpec((c, rt), lambda rb: (0, rb)),           # W out
            pl.BlockSpec((g, rt), lambda rb: (0, rb)),           # q out
            pl.BlockSpec((1, rt), lambda rb: (0, rb)),           # err² sums
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, r), jnp.float32),
            jax.ShapeDtypeStruct((g, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, rt), jnp.float32),   # w0
            pltpu.VMEM((g, 1), jnp.float32),    # hdiag
            pltpu.VMEM((g, rt), jnp.float32),   # E
            pltpu.VMEM((g, rt), jnp.float32),   # q
        ],
        input_output_aliases={1: 0},  # W updates in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(i1, w, hblk, hblkT, hinvTg, scale_row, qzero_row, maxq)
    return w_new, q_g, err2


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "group_bit_widths", "sym", "scale_bits",
                     "mse", "mse_max_shrink", "mse_n_grid", "mse_norm",
                     "feedback_dtype", "block_r", "interpret"))
def gptq_solve_stepped(
    weight_t: jax.Array,  # (C, R) f32, act-order-permuted, transposed
    hinv: jax.Array,  # (C, C) f32
    group_size: int,
    group_bit_widths,  # (G,) ints — mixed widths supported
    sym: bool = False,
    scale_bits: Optional[int] = None,  # EXL2 scale-of-scales
    mse: bool = False,
    mse_max_shrink: float = 0.8,
    mse_n_grid: int = 100,
    mse_norm: float = 2.4,
    feedback_dtype: Optional[str] = "float16",
    block_r: int = 256,
    interpret: Optional[bool] = None,
) -> dict:
    """Group-stepped GPTQ solve: per-group find_params (incl. MSE grid
    search, EXL2 scale quantization, per-group bit widths) runs in jnp on
    the host-side trace *between* Pallas group kernels, inside one jit.

    This covers every solver configuration the monolithic kernel
    (:func:`gptq_solve`) cannot — MSE, EXL2, mixed bit widths — at
    kernel speed (the latency-bound column loop stays in Pallas; only the
    embarrassingly parallel find_params runs as XLA ops).  Matches the
    reference's kernel-path schedule (``gptq_py.py:125-157``): params for
    group *i* are computed from the weight state carrying groups
    ``< i``'s tail updates.  Returns the same fields as
    ``quant.gptq._solve_uniform``.
    """
    from gptq_v2_tpu.quant import quantizer as qz
    from gptq_v2_tpu.quant.gptq import _find_params_maxq

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, r = weight_t.shape
    g = group_size
    assert c % g == 0, (c, g)
    n_groups = c // g
    assert len(group_bit_widths) == n_groups

    rt = min(block_r, max(128, r))
    while rt > 128 and 4 * c * rt * 4 + 8 * c * g > 88e6:
        rt //= 2
    r_pad = -(-r // rt) * rt
    w = weight_t.astype(jnp.float32)
    if r_pad != r:
        w = jnp.pad(w, ((0, 0), (0, r_pad - r)))
    hinv = hinv.astype(jnp.float32)

    q_parts, err2_parts, params_per_group = [], [], []
    for gi in range(n_groups):
        i1 = gi * g
        wblk = w[i1:i1 + g, :r].T  # (R, g) current state
        maxq = jnp.asarray(2.0 ** float(group_bit_widths[gi]) - 1.0,
                           jnp.float32)
        p = _find_params_maxq(wblk, maxq, sym, scale_bits)
        if mse:
            p = qz.mse_refine(p, wblk, mse_max_shrink, mse_n_grid, mse_norm)
        params_per_group.append(p)
        scale_row = p.scale[:, 0][None]  # (1, R)
        zr_row = p.qzero[:, 0][None]
        if r_pad != r:
            scale_row = jnp.pad(scale_row, ((0, 0), (0, r_pad - r)),
                                constant_values=1.0)
            zr_row = jnp.pad(zr_row, ((0, 0), (0, r_pad - r)))
        hblk = hinv[i1:i1 + g, i1:i1 + g]
        w, q_g, err2 = _step_call(
            w, jnp.asarray([gi], jnp.int32), hblk, hblk.T,
            hinv[i1:i1 + g, :].T, scale_row, zr_row,
            jnp.asarray([2.0 ** float(group_bit_widths[gi]) - 1.0],
                        jnp.float32),
            group_size=g, fb=feedback_dtype, block_r=rt,
            interpret=bool(interpret))
        q_parts.append(q_g[:, :r])
        err2_parts.append(err2[:, :r])

    q_t = jnp.concatenate(q_parts, axis=0)  # (C, R)
    scale = jnp.concatenate([p.scale for p in params_per_group], axis=1)  # (R, G)
    qzero = jnp.concatenate([p.qzero for p in params_per_group], axis=1)
    sc_cols = jnp.repeat(scale.T, g, axis=0)  # (C, R)
    zr_cols = jnp.repeat(qzero.T, g, axis=0)
    if feedback_dtype is None:
        dq_t = (q_t - zr_cols) * sc_cols
    else:
        dt = jnp.dtype(feedback_dtype)
        dq_t = ((q_t.astype(dt) - zr_cols.astype(dt)) * sc_cols.astype(dt)
                ).astype(jnp.float32)
    out = {
        "qweight": q_t.T,
        "quant": dq_t.T,
        "error_sq_mean": sum(jnp.sum(e) for e in err2_parts) / (r * c),
        "scale": scale,
        "qzero": qzero,
    }
    if scale_bits is not None:
        out["qscale"] = jnp.concatenate(
            [p.qscale for p in params_per_group], axis=1)
        out["sscale"] = jnp.concatenate(
            [p.sscale[0] for p in params_per_group], axis=0)
    return out


def gptq_solve(
    weight_t: jax.Array,  # (C, R) f32, act-order-permuted, transposed
    hinv: jax.Array,  # (C, C) f32
    group_size: int,
    maxq: float,
    sym: bool = False,
    feedback_dtype: Optional[str] = "float16",
    block_r: int = 256,
    interpret: Optional[bool] = None,
) -> dict:
    """Blocked GPTQ solve; returns the same fields as the jnp solver
    (``quant.gptq._solve_uniform``) in ``(R, C)`` / ``(R, G)`` orientation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, r = weight_t.shape
    assert c % group_size == 0, (c, group_size)
    n_real = r  # true (unpadded) row count for the error-mean denominator
    rt = min(block_r, max(128, r))
    # 2 resident (C, rt) f32 blocks (W-in-place, q), conservatively counted
    # double-buffered, plus 2 hinvT blocks; keep VMEM under budget.  At the
    # minimum rt=128 this fits 70B dims (C=28672: ~59MB + 29MB hinvT).
    while rt > 128 and 4 * c * rt * 4 + 8 * c * group_size > 88e6:
        rt //= 2
    q_t, err2_t, sc_t, zr_t = _solve_pallas(
        weight_t.astype(jnp.float32), hinv.astype(jnp.float32),
        group_size=group_size, maxq=float(maxq), sym=bool(sym),
        fb=feedback_dtype, block_r=rt, interpret=bool(interpret))
    scale = sc_t.T  # (R, G)
    qzero = zr_t.T
    g = group_size
    # dequantized weight through the same feedback dtype, (R, C)
    sc_cols = jnp.repeat(sc_t, g, axis=0)
    zr_cols = jnp.repeat(zr_t, g, axis=0)
    if feedback_dtype is None:
        dq_t = (q_t - zr_cols) * sc_cols
    else:  # same operand-wise casts as quant.gptq._feedback_dequantize
        dt = jnp.dtype(feedback_dtype)
        dq_t = ((q_t.astype(dt) - zr_cols.astype(dt)) * sc_cols.astype(dt)
                ).astype(jnp.float32)
    return {
        "qweight": q_t.T,
        "quant": dq_t.T,
        # mean over all (R, C) entries of err², from per-group lane sums
        "error_sq_mean": jnp.sum(err2_t) / (n_real * c),
        "scale": scale,
        "qzero": qzero,
    }
