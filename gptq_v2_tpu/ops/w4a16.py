"""Fused dequant + matmul Pallas kernel for W4A16 inference.

The TPU equivalent of the CUTLASS/exllama packed-INT4 GEMMs the reference
*lacks* (its eval runs on dequantized fp16 linears, reference
``quant.py:262-279``): HBM traffic is the packed int4 weight (C·R/2 bytes)
plus per-group scales/zeros — ~4× less than a bf16 GEMM, which is the whole
game at decode batch sizes where the op is memory-bound.

Uses the plane-per-group layout from ``ops/packing.py``: each grid step
loads ``(group_size, block_n)`` int32 words, extracts 8 nibble planes (each
one full quantization group, contraction = ``group_size`` = MXU-friendly),
dequantizes in registers with that group's scale/zero row, and accumulates
8 MXU matmuls into an fp32 scratch tile.  No sublane shuffles anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_v2_tpu.ops.packing import BitSlicedLinear, PackedLinear


def _kernel(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, group_size,
            n_k, bits):
    """Per grid step: ``32 // bits`` bit-planes → as many MXU dots.

    Dequantization is algebraically refactored to keep the VPU off the
    (g × bn) weight tile:  ``x @ ((q - z)·s) = (x @ q)·s - sum(x)·(z·s)``
    — per weight element only shift+mask+convert remain; the scale and the
    zero-point correction touch just (B × bn) dot outputs.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]  # (g, bn) int32
    g = group_size
    acc = acc_ref[:]
    # Codes dot in the activation dtype: bf16 codes (0..15, exact) feed the
    # native bf16 MXU path (measured faster than f32 on v5e); f32 inputs
    # (tests / f32 serving) keep an f32 dot.  Accumulation is fp32 either
    # way.  Kernel cost anatomy (v5e, 7B decode): HBM floor ~78%, the 8
    # shift+mask extractions ~18%, converts+dots ~4%.
    # scales/zs refs are (1, planes, bn): a 3-D layout whose trailing dims
    # satisfy Mosaic's block rule for EVERY plane count (planes=4 at
    # bits=8 violated the 8-sublane divisibility in the old 2-D layout —
    # a real-TPU-only lowering failure the CPU interpret tests never hit)
    code_dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    planes, mask = 32 // bits, (1 << bits) - 1
    for i in range(planes):
        codes = ((words >> (bits * i)) & mask).astype(code_dt)  # (g, bn)
        x_i = x_ref[:, i * g:(i + 1) * g].astype(code_dt)
        dot = jax.lax.dot_general(
            x_i, codes,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x_sum = jnp.sum(x_i.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1)
        acc += dot * s_ref[0, i, :][None, :].astype(jnp.float32) \
            - x_sum * zs_ref[0, i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_a8(x_ref, w_ref, s_ref, zs_ref, xs_ref, out_ref, acc_ref, *,
               group_size, n_k, bits):
    """W4A8 grid step: int8 activations × int8 weight codes on the MXU
    (~2x the bf16 rate on v5e — measured 125 vs 89 T(FL)OP/s same-epoch).

    Same algebraic refactor as :func:`_kernel` in integer arithmetic:
    ``x @ ((q - z)·s) ≈ [(xq @ q)·s - sum(xq)·(z·s)] · x_scale_row`` where
    ``xq = round(x / x_scale_row)`` per activation row (dynamic per-row
    symmetric int8 — the standard W4A8 recipe).  The int32 dot output
    converts to f32 only at (bm × bn) tile granularity.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]  # (g, bn) int32
    g = group_size
    acc = acc_ref[:]
    planes, mask = 32 // bits, (1 << bits) - 1
    # bits=8 codes span [0, 255] and would WRAP in the int8 MXU operand;
    # center them by 128 and add the offset back through the (exact) row
    # sums:  x @ q = x @ (q - 128) + 128·Σx.  bits<=4 codes fit directly.
    off = 128 if bits == 8 else 0
    for i in range(planes):
        codes = (((words >> (bits * i)) & mask) - off).astype(jnp.int8)
        x_i = x_ref[:, i * g:(i + 1) * g]  # (bm, g) int8
        dot = jax.lax.dot_general(
            x_i, codes,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x_sum_i = jnp.sum(x_i.astype(jnp.int32), axis=1,
                          keepdims=True)  # (bm, 1) exact
        if off:
            dot = dot + off * x_sum_i
        x_sum = x_sum_i.astype(jnp.float32)
        acc += dot.astype(jnp.float32) \
            * s_ref[0, i, :][None, :].astype(jnp.float32) \
            - x_sum * zs_ref[0, i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * xs_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n",
                                             "interpret", "bits"))
def _w4a8_2d(xq, x_scale, qweight, scales, zeros, group_size: int,
             block_n: int, interpret: bool, bits: int = 4):
    """xq: (B, C_pad) int8 (stored column order); x_scale: (B, 1) f32
    per-row dequant scales; returns (B, R) in the scales' dtype."""
    b, c_pad = xq.shape
    _, r = qweight.shape
    g = group_size
    planes = 32 // bits
    bk = planes * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    bm = min(b, 512)
    assert b % bm == 0, (b, bm)
    n_i = b // bm

    zs = (zeros.astype(jnp.float32)
          * scales.astype(jnp.float32)).astype(scales.dtype)
    s3 = scales.reshape(n_k, planes, r)
    zs3 = zs.reshape(n_k, planes, r)
    kernel = functools.partial(_kernel_a8, group_size=g, n_k=n_k, bits=bits)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, block_n), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, block_n), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), scales.dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c_pad * r,
            bytes_accessed=n_i * c_pad * r * bits // 8
            + b * c_pad + 2 * (c_pad // g) * r * scales.dtype.itemsize
            + b * r * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qweight, s3, zs3, x_scale)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n",
                                             "interpret", "bits"))
def _w4a16_2d(x, qweight, scales, zeros, group_size: int, block_n: int,
              interpret: bool, bits: int = 4):
    """x: (B, C_pad) compute dtype (stored column order); returns (B, R).

    Grid tiles (rows, out-features, contraction); row tiling keeps prefill
    (B = batch·seq, thousands of rows) inside the VMEM budget while decode
    (small B) runs a single row tile.
    """
    b, c_pad = x.shape
    _, r = qweight.shape
    g = group_size
    planes = 32 // bits
    bk = planes * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    bm = min(b, 512)
    assert b % bm == 0, (b, bm)
    n_i = b // bm

    zs = (zeros.astype(jnp.float32) * scales.astype(jnp.float32)).astype(scales.dtype)
    # 3-D (n_k, planes, R) scale layout — trailing dims (planes, bn) are
    # full-dim/aligned for every bits value (see the kernel comment)
    s3 = scales.reshape(n_k, planes, r)
    zs3 = zs.reshape(n_k, planes, r)
    kernel = functools.partial(_kernel, group_size=g, n_k=n_k, bits=bits)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, block_n), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, block_n), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c_pad * r,
            bytes_accessed=n_i * c_pad * r * bits // 8
            + b * c_pad * x.dtype.itemsize
            + 2 * (c_pad // g) * r * scales.dtype.itemsize + b * r * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, s3, zs3)


def w4a16_matmul(
    x: jax.Array,  # (..., C) in original column order
    p,  # PackedLinear | BitSlicedLinear
    block_n: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:
    """``y = x @ dequantize(p)`` — fused, reading packed low-bit weights
    from HBM (INT4 by default; ``p.bits`` of 2 or 8 use the same
    plane-per-group kernel with 16 or 4 planes per word).

    Applies the act-order gather to ``x``, zero-pads the contraction to the
    packing block, runs the Pallas kernel, returns ``(..., R)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(p, BitSlicedLinear):
        # 3-bit: q = lo + 4·hi — two passes of the same kernel (the hi
        # slice carries scales 4s and zero-point 0), summed.  Total weight
        # HBM traffic is exactly 3 bits/weight.
        return (w4a16_matmul(x, p.lo, block_n, interpret)
                + w4a16_matmul(x, p.hi, block_n, interpret))
    lead = x.shape[:-1]
    c = x.shape[-1]
    assert c == p.in_features, (c, p.in_features)
    xb = x.reshape(-1, c)
    if p.perm is not None:
        # (B, stored) — may differ from c (TP row shard).  perm entries are
        # always in bounds, so "clip" drops XLA's fill-mode compare+select
        # around the lane gather (this JAX has no promise_in_bounds
        # spelling on jnp.take).  Uniqueness holds only when perm is a
        # full permutation: TP row shards pad with duplicate index-0
        # entries (packing.split_packed_row), where promising uniqueness
        # would make the gather undefined.
        xb = jnp.take(xb, p.perm, axis=1, mode="clip",
                      unique_indices=p.perm.shape[0] == p.in_features)
    stored = xb.shape[1]
    c_pad = p.in_features_padded
    if c_pad != stored:
        xb = jnp.pad(xb, ((0, 0), (0, c_pad - stored)))
    b = xb.shape[0]
    if b <= 512:
        b_pad = max(8, -(-b // 8) * 8)
    else:  # row-tiled grid: rows must divide into 512-row tiles
        b_pad = -(-b // 512) * 512
    if b_pad != b:
        xb = jnp.pad(xb, ((0, b_pad - b), (0, 0)))
    # Non-dividing output blocks are legal (Pallas masks the edge tile) and
    # measured FASTER than shrinking to a divisor: 4096->11008 streams
    # 313 GB/s at bn=1024 vs 232 GB/s at the old bn=256 divisor fallback
    # (v5e device-trace sweep, scripts/bench_w4a16_layouts.py).  bn=2048
    # adds ~5% on the dividing shapes (344/352 GB/s on q/down).
    r = p.out_features
    bn = min(block_n, r)
    # Scoped-VMEM cap: the fp32 accumulator (bm x bn) plus double-buffered
    # x/out tiles must fit the 16 MiB scoped budget.  Row-tiled prefill
    # (bm 512) with bn 2048 measures 16.66 MiB and fails to compile; decode
    # (bm <= 128) keeps the full bn = 2048 fast path.
    bm_eff = min(b_pad, 512)
    while bn > 256 and bm_eff * bn > 512 * 1024:
        bn //= 2
    if p.act_bits == 8:
        # W4A8: per-row dynamic symmetric int8 activation quantization
        # (pad rows have amax 0 -> scale floor keeps them zero)
        amax = jnp.max(jnp.abs(xb.astype(jnp.float32)), axis=1,
                       keepdims=True)
        x_scale = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xb.astype(jnp.float32) / x_scale),
                      -127, 127).astype(jnp.int8)
        out = _w4a8_2d(xq, x_scale, p.qweight, p.scales, p.zeros,
                       group_size=p.group_size, block_n=bn,
                       interpret=interpret, bits=p.bits)
        return out[:b].reshape(*lead, r)
    out = _w4a16_2d(xb.astype(p.scales.dtype), p.qweight, p.scales, p.zeros,
                    group_size=p.group_size, block_n=bn, interpret=interpret,
                    bits=p.bits)
    return out[:b].reshape(*lead, r)
