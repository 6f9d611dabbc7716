"""Packed-INT4 weight format for W4A16 inference.

The reference has **no** packed inference format (it dequantizes back to
fp16 ``nn.Linear``, reference ``quant.py:262-279``); this is the new
capability mandated by BASELINE.json's north star.

Layout — designed so the Pallas kernel's unpack is *free* of sublane
interleaves (the expensive part of naive nibble packing on TPU):

* the contracting dim (C, stored/act-order column order) is processed in
  kernel blocks of ``8 · group_size`` columns;
* within a block, nibble-plane ``i`` of the ``group_size`` packed words
  holds **exactly quantization group ``i``** of that block.  Extracting
  plane ``i`` (``(w >> 4i) & 15``) therefore yields a contiguous
  ``(group_size, R)`` weight chunk whose scale/zero is a single row — the
  kernel runs 8 MXU matmuls of contraction ``group_size`` per block, no
  reshuffle;
* ``qweight``: int32 ``(C_pad/8, R)``; C is zero-padded to a multiple of
  ``8·group_size`` (padded groups get scale 0, so they contribute nothing);
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
    """

    qweight: jax.Array  # (C_pad/8, R) int32, plane-per-group layout
    scales: jax.Array  # (G_pad, R) compute dtype
    zeros: jax.Array  # (G_pad, R) compute dtype (float zero-points)
    perm: Optional[jax.Array]  # (C,) int32 or None (no act-order)
    group_size: int
    in_features: int  # original C
    bits: int = 4

    @property
    def out_features(self) -> int:
        return self.qweight.shape[1]

    @property
    def in_features_padded(self) -> int:
        return self.qweight.shape[0] * 8

    def tree_flatten(self):
        return ((self.qweight, self.scales, self.zeros, self.perm),
                (self.group_size, self.in_features, self.bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _pad_cols(codes: np.ndarray, block: int) -> np.ndarray:
    r, c = codes.shape
    rem = c % block
    if rem == 0:
        return codes
    return np.concatenate(
        [codes, np.zeros((r, block - rem), dtype=codes.dtype)], axis=1
    )


def pack_int4(codes: np.ndarray, group_size: int) -> np.ndarray:
    """(R, C) uint8 codes (stored column order) → (C_pad/8, R) int32.

    Plane-per-group shuffle: word ``w`` of block ``b`` packs, in nibble
    ``i``, the code of stored column ``b·8g + i·g + w``.
    """
    assert codes.max(initial=0) <= 15
    g = group_size
    codes = _pad_cols(codes, 8 * g)
    r, c = codes.shape
    blocks = c // (8 * g)
    # (R, blocks, 8 planes, g words) — plane i = group i of the block
    ct = codes.T.reshape(blocks, 8, g, r).astype(np.uint32)
    word = np.zeros((blocks, g, r), dtype=np.uint32)
    for i in range(8):
        word |= ct[:, i, :, :] << (4 * i)
    return word.reshape(c // 8, r).astype(np.int32)


def unpack_int4(packed: np.ndarray, group_size: int, c_orig: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`pack_int4`: (C_pad/8, R) int32 → (R, C) uint8."""
    g = group_size
    c8, r = packed.shape
    blocks = c8 // g
    w = packed.astype(np.uint32).reshape(blocks, g, r)
    planes = [(w >> (4 * i)) & 0xF for i in range(8)]  # each (blocks, g, r)
    out = np.stack(planes, axis=1).reshape(blocks * 8 * g, r).T.astype(np.uint8)
    if c_orig is not None:
        out = out[:, :c_orig]
    return out


def pack_quant_meta(quant_meta: dict, compute_dtype=jnp.bfloat16) -> PackedLinear:
    """Build a :class:`PackedLinear` from a solver ``quant_meta`` dict.

    Requires uniform 4-bit groups (the W4A16 kernel's contract); other bit
    widths use the dense dequantized path.
    """
    bits = np.unique(np.asarray(quant_meta["group_bit_widths"]))
    assert bits.tolist() == [4], f"W4 packing needs uniform 4-bit groups, got {bits}"
    group_sizes = np.asarray(quant_meta["group_sizes"], dtype=np.int64)
    assert len(np.unique(group_sizes)) == 1, "uniform group size required"
    g = int(group_sizes[0])

    qweight = np.asarray(quant_meta["qweight"], dtype=np.uint8)
    r, c = qweight.shape
    packed = pack_int4(qweight, g)
    g_pad = packed.shape[0] // g * 8

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
    )


def dequantize_dense(p: PackedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Dense (C, R) dequantized weight in *original* column order — the jnp
    twin of the fused kernel, and the fallback path for non-4-bit configs."""
    codes = jnp.asarray(
        unpack_int4(np.asarray(p.qweight), p.group_size).astype(np.float32)
    )  # (R, C_pad)
    g = p.group_size
    scales = jnp.repeat(p.scales.astype(jnp.float32).T, g, axis=1)  # (R, C_pad)
    zeros = jnp.repeat(p.zeros.astype(jnp.float32).T, g, axis=1)
    w = ((codes - zeros) * scales).astype(dtype)[:, :p.in_features]  # stored order
    if p.perm is not None:
        inv = jnp.argsort(p.perm)
        w = jnp.take(w, inv, axis=1)
    return w.T  # (C, R), original order
