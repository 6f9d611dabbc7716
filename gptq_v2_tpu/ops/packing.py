"""Packed low-bit weight format for W4A16 / W8A16 / W2A16 inference.

The reference has **no** packed inference format (it dequantizes back to
fp16 ``nn.Linear``, reference ``quant.py:262-279``); this is the new
capability mandated by BASELINE.json's north star.

Layout — designed so the Pallas kernel's unpack is *free* of sublane
interleaves (the expensive part of naive nibble packing on TPU):

* the contracting dim (C, stored/act-order column order) is processed in
  kernel blocks of ``planes · group_size`` columns, where
  ``planes = 32 // bits`` (8 nibble planes for INT4, 4 byte planes for
  INT8, 16 for INT2);
* within a block, bit-plane ``i`` of the ``group_size`` packed words
  holds **exactly quantization group ``i``** of that block.  Extracting
  plane ``i`` (``(w >> bits·i) & maxmask``) therefore yields a contiguous
  ``(group_size, R)`` weight chunk whose scale/zero is a single row — the
  kernel runs ``planes`` MXU matmuls of contraction ``group_size`` per
  block, no reshuffle;
* ``qweight``: int32 ``(C_pad/planes, R)``; C is zero-padded to a multiple
  of ``planes·group_size`` (padded groups get scale 0, contributing 0);
* ``scales`` / ``zeros``: ``(G_pad, R)``; ``perm``: stored→original column
  map for the activation gather (standard act-order trick).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedLinear:
    """Device-resident packed W4 linear: y = x[..., perm] @ deq(W).

    A pytree whose array fields trace under jit while the layout metadata
    (group_size/in_features/bits) stays static.

    ``in_features`` is the expected *activation* width.  ``perm`` maps
    stored (packed) columns to activation columns; its length is the stored
    width, which equals ``in_features`` for a whole layer but may differ for
    a tensor-parallel row shard (the shard stores a slice of the columns
    while gathering from the full activation — ``parallel/tp.py``).
    """

    qweight: jax.Array  # (C_pad/8, R) int32, plane-per-group layout
    scales: jax.Array  # (G_pad, R) compute dtype
    zeros: jax.Array  # (G_pad, R) compute dtype (float zero-points)
    perm: Optional[jax.Array]  # (C_stored,) int32 or None (no act-order)
    group_size: int
    in_features: int  # activation width C
    bits: int = 4
    # activation precision: 16 = bf16/f32 MXU dots (default); 8 = W4A8 —
    # per-row dynamic int8 activation quantization feeding int8 MXU dots
    # at ~2x the bf16 rate (serving.model.to_w4a8; single-device tier)
    act_bits: int = 16

    @property
    def out_features(self) -> int:
        return self.qweight.shape[1]

    @property
    def planes(self) -> int:
        """Codes per packed int32 word."""
        return 32 // self.bits

    @property
    def in_features_padded(self) -> int:
        return self.qweight.shape[0] * self.planes

    def tree_flatten(self):
        return ((self.qweight, self.scales, self.zeros, self.perm),
                (self.group_size, self.in_features, self.bits,
                 self.act_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BitSlicedLinear:
    """3-bit packed linear as two bit-planes of the SAME quantization:
    ``q = lo + 4·hi`` with ``lo`` the low 2 bits (16 codes/word) and
    ``hi`` the top bit (32 codes/word) — 3 bits/weight exactly, no wasted
    slots.  The affine dequant distributes over the slices::

        y = s·(x@q) − Σx·z·s = [s·(x@lo) − Σx·z·s] + [4s·(x@hi) − 0]

    so serving is two calls of the SAME fused plane-per-group kernel
    (``ops/w4a16.py``): the lo slice with ``(s, z)`` and the hi slice with
    scales ``4s`` and zero-point 0.  No new kernel code; HBM reads stay
    3 bits/weight (+ one duplicated activation read, negligible at decode).
    TP splits are unsupported (the two slices' packing blocks differ, so a
    row shard cannot align both) — 3-bit models serve single-device/PP.
    """

    lo: "PackedLinear"  # 2-bit slice, carries scales/zeros/perm
    hi: "PackedLinear"  # 1-bit slice, scales = 4·s, zeros = 0

    bits = 3

    @property
    def in_features(self) -> int:
        return self.lo.in_features

    @property
    def out_features(self) -> int:
        return self.lo.out_features

    @property
    def group_size(self) -> int:
        return self.lo.group_size

    @property
    def perm(self):
        return self.lo.perm

    @property
    def scales(self):
        return self.lo.scales

    def tree_flatten(self):
        return ((self.lo, self.hi), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pad_cols(codes: np.ndarray, block: int) -> np.ndarray:
    r, c = codes.shape
    rem = c % block
    if rem == 0:
        return codes
    return np.concatenate(
        [codes, np.zeros((r, block - rem), dtype=codes.dtype)], axis=1
    )


def pack_codes(codes: np.ndarray, group_size: int,
               bits: int = 4) -> np.ndarray:
    """(R, C) uint8 codes (stored column order) → (C_pad/planes, R) int32,
    ``planes = 32 // bits``.

    Plane-per-group shuffle: word ``w`` of block ``b`` packs, in bit-plane
    ``i``, the code of stored column ``b·planes·g + i·g + w``.  INT4
    dispatches to the C++ implementation (``gptq_v2_tpu.native``) when
    available; this numpy body is the behavioral reference.
    """
    assert bits in (1, 2, 4, 8) and codes.max(initial=0) < (1 << bits)
    planes = 32 // bits
    g = group_size
    codes = _pad_cols(codes, planes * g)
    if bits == 4:
        from gptq_v2_tpu import native

        out = native.pack_int4(codes, g)
        if out is not None:
            return out
    r, c = codes.shape
    blocks = c // (planes * g)
    # (R, blocks, planes, g words) — plane i = group i of the block
    ct = codes.T.reshape(blocks, planes, g, r).astype(np.uint32)
    word = np.zeros((blocks, g, r), dtype=np.uint32)
    for i in range(planes):
        word |= ct[:, i, :, :] << (bits * i)
    return word.reshape(c // planes, r).astype(np.int32)


def unpack_codes(packed: np.ndarray, group_size: int, bits: int = 4,
                 c_orig: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`pack_codes`: (C_pad/planes, R) int32 → (R, C)."""
    out = None
    if bits == 4:
        from gptq_v2_tpu import native

        out = native.unpack_int4(np.asarray(packed), group_size)
    if out is None:
        planes = 32 // bits
        mask = (1 << bits) - 1
        g = group_size
        cw, r = packed.shape
        blocks = cw // g
        w = packed.astype(np.uint32).reshape(blocks, g, r)
        ps = [(w >> (bits * i)) & mask for i in range(planes)]
        out = np.stack(ps, axis=1).reshape(blocks * planes * g,
                                           r).T.astype(np.uint8)
    if c_orig is not None:
        out = out[:, :c_orig]
    return out


def pack_int4(codes: np.ndarray, group_size: int) -> np.ndarray:
    return pack_codes(codes, group_size, 4)


def unpack_int4(packed: np.ndarray, group_size: int,
                c_orig: Optional[int] = None) -> np.ndarray:
    return unpack_codes(packed, group_size, 4, c_orig)


def pack_quant_meta(quant_meta: dict, compute_dtype=jnp.bfloat16) -> PackedLinear:
    """Build a :class:`PackedLinear` from a solver ``quant_meta`` dict.

    Uniform groups of 2, 4, or 8 bits pack directly (``planes = 32 //
    bits``); uniform 3-bit groups pack as a :class:`BitSlicedLinear`
    (2-bit + 1-bit slices of the same quantization).
    """
    bits_u = np.unique(np.asarray(quant_meta["group_bit_widths"]))
    assert bits_u.size == 1 and int(bits_u[0]) in (1, 2, 3, 4, 8), \
        f"packing needs uniform 1/2/3/4/8-bit groups, got {bits_u}"
    bits = int(bits_u[0])
    if bits == 3:
        qw = np.asarray(quant_meta["qweight"], dtype=np.uint8)
        lo = pack_quant_meta({**quant_meta,
                              "qweight": qw & 3,
                              "group_bit_widths": np.full_like(
                                  np.asarray(quant_meta["group_bit_widths"]),
                                  2)},
                             compute_dtype)
        hi_meta = {**quant_meta, "qweight": qw >> 2,
                   "group_bit_widths": np.full_like(
                       np.asarray(quant_meta["group_bit_widths"]), 1)}
        hi = pack_quant_meta(hi_meta, compute_dtype)
        hi = dataclasses.replace(
            hi,
            scales=(hi.scales.astype(jnp.float32) * 4.0
                    ).astype(compute_dtype),
            zeros=jnp.zeros_like(hi.zeros))
        return BitSlicedLinear(lo=lo, hi=hi)
    planes = 32 // bits
    group_sizes = np.asarray(quant_meta["group_sizes"], dtype=np.int64)
    assert len(np.unique(group_sizes)) == 1, "uniform group size required"
    g = int(group_sizes[0])

    qweight = np.asarray(quant_meta["qweight"], dtype=np.uint8)
    r, c = qweight.shape
    packed = pack_codes(qweight, g, bits)
    g_pad = packed.shape[0] // g * planes

    if quant_meta.get("sscale") is not None:
        qs = np.asarray(quant_meta["qscale"], dtype=np.float32)
        ss = np.asarray(quant_meta["sscale"], dtype=np.float32)[None, :]
        scales = (qs * qs * ss).T  # (G, R)
    else:
        scales = np.asarray(quant_meta["scale"], dtype=np.float32).T
    zeros = np.asarray(quant_meta["qzero"], dtype=np.float32).T
    pad_g = g_pad - scales.shape[0]
    if pad_g:
        scales = np.concatenate([scales, np.zeros((pad_g, r), np.float32)], axis=0)
        zeros = np.concatenate([zeros, np.zeros((pad_g, r), np.float32)], axis=0)

    perm = quant_meta.get("perm")
    perm_arr = None
    if perm is not None:
        perm_np = np.asarray(perm, dtype=np.int64)
        if not np.array_equal(perm_np, np.arange(len(perm_np))):
            perm_arr = jnp.asarray(perm_np.astype(np.int32))

    return PackedLinear(
        qweight=jnp.asarray(packed),
        scales=jnp.asarray(scales.astype(compute_dtype)),
        zeros=jnp.asarray(zeros.astype(compute_dtype)),
        perm=perm_arr,
        group_size=g,
        in_features=c,
        bits=bits,
    )


def rtn_pack_dense(w: np.ndarray, group_size: int,
                   compute_dtype=None, bits: int = 4) -> PackedLinear:
    """RTN-quantize a dense ``(C, R)`` weight to a packed low-bit linear.

    Asymmetric per-group (along C), no Hessian — for weights outside the
    GPTQ pass (e.g. the optional packed lm_head; the reference never
    quantizes lm_head, so RTN keeps this strictly additive).  ``bits``:
    4 (default) or 8/2 via the same plane-per-group layout.
    """
    import jax.numpy as _jnp

    if compute_dtype is None:
        compute_dtype = _jnp.bfloat16
    w = np.asarray(w, dtype=np.float32)
    c, r = w.shape
    g = group_size
    maxq = (1 << bits) - 1
    assert c % g == 0, (c, g)
    wg = w.reshape(c // g, g, r)
    x_max = np.maximum(wg.max(axis=1), 0.0)  # (G, R)
    x_min = np.minimum(wg.min(axis=1), 0.0)
    scale = (x_max - x_min) / maxq + 1e-12
    zero = np.round(-x_min / scale)
    codes = np.clip(np.round(wg / scale[:, None, :]) + zero[:, None, :],
                    0.0, maxq).astype(np.uint8)
    codes_rc = codes.reshape(c, r).T  # (R, C)
    packed = pack_codes(codes_rc, g, bits=bits)
    g_pad = packed.shape[0] // g * (32 // bits)
    pad = g_pad - c // g
    if pad:
        scale = np.concatenate([scale, np.zeros((pad, r), np.float32)])
        zero = np.concatenate([zero, np.zeros((pad, r), np.float32)])
    return PackedLinear(
        qweight=jnp.asarray(packed),
        scales=jnp.asarray(scale).astype(compute_dtype),
        zeros=jnp.asarray(zero).astype(compute_dtype),
        perm=None,
        group_size=g,
        in_features=c,
        bits=bits,
    )


def split_packed_column(p, n_shards: int) -> list:
    if isinstance(p, BitSlicedLinear):
        raise NotImplementedError(
            "tensor-parallel splits of 3-bit (bit-sliced) linears are not"
            " supported — the 2-bit and 1-bit slices' packing blocks cannot"
            " align on one row boundary; serve 3-bit models single-device"
            " or with pipeline parallelism")
    return _split_packed_column(p, n_shards)


def _split_packed_column(p: PackedLinear, n_shards: int) -> list:
    """Column-parallel split: shard the output dim R into ``n_shards``
    contiguous chunks (Megatron-style).  Each shard keeps the full
    contraction (and the full act-order perm); outputs concatenate.
    """
    r = p.out_features
    assert r % n_shards == 0, f"out_features {r} not divisible by tp={n_shards}"
    rl = r // n_shards
    return [
        PackedLinear(
            qweight=p.qweight[:, i * rl:(i + 1) * rl],
            scales=p.scales[:, i * rl:(i + 1) * rl],
            zeros=p.zeros[:, i * rl:(i + 1) * rl],
            perm=p.perm,
            group_size=p.group_size,
            in_features=p.in_features,
            bits=p.bits,
        )
        for i in range(n_shards)
    ]


def split_packed_row(p, n_shards: int) -> list:
    if isinstance(p, BitSlicedLinear):
        raise NotImplementedError(
            "tensor-parallel splits of 3-bit (bit-sliced) linears are not"
            " supported; serve 3-bit models single-device or with pipeline"
            " parallelism")
    return _split_packed_row(p, n_shards)


def _split_packed_row(p: PackedLinear, n_shards: int) -> list:
    """Row-parallel split: shard the stored contraction columns into
    ``n_shards`` chunks of whole quantization groups; partial outputs sum
    (psum over the model axis).

    Every shard's ``perm`` indexes the **full** activation (act-order mixes
    original columns across shards, so row-parallel layers gather the full
    activation and each shard selects its slice).  Shards are padded to a
    common group count with zero-scale groups (perm pad entries point at
    column 0; scale 0 keeps them inert).
    """
    g = p.group_size
    codes = unpack_codes(np.asarray(p.qweight), g, p.bits)  # (R, C_pad) stored
    c_stored = len(p.perm) if p.perm is not None else p.in_features
    codes = codes[:, :c_stored]
    n_groups = -(-c_stored // g)
    g_loc = -(-n_groups // n_shards)
    perm_full = (np.asarray(p.perm, np.int64) if p.perm is not None
                 else np.arange(c_stored, dtype=np.int64))
    scales = np.asarray(p.scales, np.float32)[:n_groups]  # (G, R)
    zeros = np.asarray(p.zeros, np.float32)[:n_groups]
    shards = []
    for i in range(n_shards):
        c0, c1 = i * g_loc * g, min((i + 1) * g_loc * g, c_stored)
        g0, g1 = i * g_loc, min((i + 1) * g_loc, n_groups)
        codes_i = np.zeros((codes.shape[0], g_loc * g), np.uint8)
        scales_i = np.zeros((g_loc, scales.shape[1]), np.float32)
        zeros_i = np.zeros((g_loc, zeros.shape[1]), np.float32)
        perm_i = np.zeros((g_loc * g,), np.int64)
        if c1 > c0:
            codes_i[:, :c1 - c0] = codes[:, c0:c1]
            scales_i[:g1 - g0] = scales[g0:g1]
            zeros_i[:g1 - g0] = zeros[g0:g1]
            perm_i[:c1 - c0] = perm_full[c0:c1]
        packed = pack_codes(codes_i, g, p.bits)
        g_pad = packed.shape[0] // g * p.planes
        pad_g = g_pad - g_loc
        if pad_g:
            scales_i = np.concatenate([scales_i, np.zeros((pad_g, scales_i.shape[1]), np.float32)])
            zeros_i = np.concatenate([zeros_i, np.zeros((pad_g, zeros_i.shape[1]), np.float32)])
            perm_i = np.concatenate([perm_i, np.zeros((pad_g * g,), np.int64)])
        shards.append(PackedLinear(
            qweight=jnp.asarray(packed),
            scales=jnp.asarray(scales_i.astype(np.asarray(p.scales).dtype)),
            zeros=jnp.asarray(zeros_i.astype(np.asarray(p.zeros).dtype)),
            perm=jnp.asarray(perm_i.astype(np.int32)),
            group_size=g,
            in_features=p.in_features,
            bits=p.bits,
        ))
    return shards


def dequantize_dense(p, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(p, BitSlicedLinear):  # (q_lo - z)·s + (q_hi)·4s = (q - z)·s
        return (dequantize_dense(p.lo, dtype).astype(jnp.float32)
                + dequantize_dense(p.hi, dtype).astype(jnp.float32)
                ).astype(dtype)
    return _dequantize_dense_packed(p, dtype)


def _dequantize_dense_packed(p: PackedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Dense (C, R) dequantized weight in *original* column order — the jnp
    twin of the fused kernel, and the fallback path for non-4-bit configs.

    Handles TP row shards (stored width < ``in_features``): stored columns
    scatter-add into their original positions; padding columns carry scale 0
    so they contribute nothing even where pad perm entries collide.
    """
    codes = unpack_codes(np.asarray(p.qweight), p.group_size,
                         p.bits).astype(np.float32)
    g = p.group_size
    scales = np.repeat(np.asarray(p.scales, np.float32).T, g, axis=1)  # (R, C_pad)
    zeros = np.repeat(np.asarray(p.zeros, np.float32).T, g, axis=1)
    w = (codes - zeros) * scales  # (R, C_pad) stored order
    if p.perm is None:
        return jnp.asarray(w[:, :p.in_features].T.astype(dtype))  # (C, R)
    perm = np.asarray(p.perm, np.int64)
    out = np.zeros((w.shape[0], p.in_features), np.float32)
    np.add.at(out, (slice(None), perm), w[:, :len(perm)])
    return jnp.asarray(out.T.astype(dtype))  # (C, R), original order
