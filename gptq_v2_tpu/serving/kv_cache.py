"""KV caches (new capability; the reference has no serving stack).

Two layouts behind one engine:

* :class:`ContiguousKVCache` — **the TPU-native default**: per decode slot
  a contiguous ``(max_len, n_kv, hd)`` region.  Attention reads the cache
  *in place* (a static slice feeds the einsum at full HBM streaming rate)
  with a length mask; there is no gather at all.  XLA's row-gather on TPU
  measures ~4x below streaming bandwidth, so avoiding it is worth the
  per-slot max-length preallocation — the standard TPU-serving trade.
* :class:`PagedKVCache` — vLLM-style page pool for allocation flexibility
  (long/short mixes without per-slot preallocation).  Layout per layer:
  ``(n_pages, page_size, 2 · n_kv_heads, head_dim)`` with K and V
  *interleaved* along the combined-head axis (K at even indices, V at odd)
  — the native layout of the TPU ragged-paged-attention kernel
  (``ops/paged_attention.py``).  Token-major: one token's full K+V write is
  a single contiguous ``(2·n_kv, hd)`` row (an efficient one-row-per-token
  scatter), and the kernel DMA-streams whole pages.  Logical position ``t``
  of a sequence lives at page ``block_table[t // page_size]``, offset
  ``t % page_size``.  Off-TPU, attention assembles K/V via the
  :func:`gather_kv` jnp twin.

All functions are pure/jittable; free-slot/page bookkeeping is host-side in
the engine.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    kv: jax.Array  # (n_layers, n_pages, page_size, 2·n_kv, hd); K even, V odd
    page_size: int  # static
    # per-layer static quantization scales (int8 storage); None = full
    # precision.  Static/hashable aux: each unrolled layer's attention
    # bakes its own scalar in, so per-layer scales cost no recompiles.
    k_scales: Optional[Tuple[float, ...]] = None
    v_scales: Optional[Tuple[float, ...]] = None
    # 4 = nibble-packed int8 pages (ADJACENT kv-head pairs per byte,
    # :func:`pack_int4_rows_adj`); the combined-head axis is then
    # ``2 · (n_kv/2) = n_kv`` and the ragged kernel fork unpacks in-kernel
    # (``ops/_ragged_sink_kernel.py`` ``kv_int4``).  0 = storage dtype.
    kv_bits: int = 0

    @property
    def n_slots(self) -> int:
        return self.kv.shape[1] * self.kv.shape[2]

    @property
    def kv_storage_dtype(self):
        return self.kv.dtype

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def tree_flatten(self):
        return ((self.kv,), (self.page_size, self.k_scales, self.v_scales,
                             self.kv_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def init_cache(n_layers: int, n_pages: int, page_size: int, n_kv: int, hd: int,
               dtype=jnp.bfloat16, k_scales=None, v_scales=None,
               kv_bits: Optional[int] = None) -> PagedKVCache:
    if kv_bits == 4:
        assert n_kv % 2 == 0, "int4 pages pack adjacent kv-head pairs"
        assert k_scales is not None and v_scales is not None
        shape = (n_layers, n_pages, page_size, n_kv, hd)  # 2·(n_kv/2) packed
        return PagedKVCache(jnp.zeros(shape, jnp.int8), page_size,
                            k_scales, v_scales, kv_bits=4)
    shape = (n_layers, n_pages, page_size, 2 * n_kv, hd)
    return PagedKVCache(jnp.zeros(shape, dtype), page_size,
                        k_scales, v_scales)


def pack_int4_rows(q4: jax.Array) -> jax.Array:
    """(…, n_kv, hd) int32 nibble values in [-7, 7] → (…, n_kv/2, hd) int8.

    Byte ``[h, d]`` holds kv-head ``h``'s element ``d`` (low nibble) and
    kv-head ``h + n_kv/2``'s (high nibble) — the **head-pair** layout.
    Packing along the head axis keeps the cache's minor dim at the full
    ``hd`` (128 lanes): a packed last dim of ``hd/2 = 64`` made XLA:TPU
    store the cache in a "compressed" layout and insert a full-cache
    transpose copy per layer per step (measured 26 ms x 96 = 2.5 s/step).
    Attention needs no interleave either way: the low pass dots against
    the first half of the kv heads, the high pass against the second, and
    scores/PV concatenate along the head axis.
    """
    n = q4.shape[-2]
    lo = q4[..., : n // 2, :] & 0xF
    hi = q4[..., n // 2:, :] << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_rows(p8: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4_rows` (sign-extending); int32 out."""
    w = p8.astype(jnp.int32)
    lo = (w << 28) >> 28
    hi = (w << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-2)


def pack_int4_rows_adj(q4: jax.Array) -> jax.Array:
    """(…, n_kv, hd) int32 nibble values in [-7, 7] → (…, n_kv/2, hd) int8.

    ADJACENT-pair layout: byte ``[p, d]`` holds kv-head ``2p`` (low nibble)
    and ``2p + 1`` (high) — the paged-cache packing.  Unlike the contiguous
    cache's half-split pairing (:func:`pack_int4_rows`, chosen so XLA can
    slice the two halves cheaply), adjacency keeps a packed block's REAL
    heads contiguous, which is what lets the ragged kernel's heads-blocking
    and q BlockSpec run unchanged (``_ragged_sink_kernel.py`` ``kv_int4``).
    """
    lo = q4[..., 0::2, :] & 0xF
    hi = q4[..., 1::2, :] << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_rows_adj(p8: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4_rows_adj` (sign-extending); int32 out."""
    w = p8.astype(jnp.int32)
    lo = (w << 28) >> 28
    hi = (w << 24) >> 28
    st = jnp.stack([lo, hi], axis=-2)  # (…, n_kv/2, 2, hd)
    return st.reshape(*p8.shape[:-2], 2 * p8.shape[-2], p8.shape[-1])


def _scale_arr(s, kv_offset=None, n_loc=None):
    """Per-layer scale entry → broadcastable array over ``(..., n_kv, hd)``.
    Scalar floats stay 0-d; per-head tuples become ``(n_kv, 1)`` — sliced
    to the shard's ``[kv_offset, kv_offset + n_loc)`` heads under TP
    (``kv_offset`` may be a traced ``axis_index`` product)."""
    a = jnp.asarray(s, jnp.float32)
    if a.ndim:
        if kv_offset is not None:
            a = jax.lax.dynamic_slice(a, (kv_offset,), (n_loc,))
        a = a[:, None]
    return a


def quantize_kv_write(cache, layer: int, k: jax.Array, v: jax.Array,
                      kv_offset=None):
    """Quantize new K/V for storage when the cache holds int8/int4-packed
    (symmetric, static per-layer scalar or per-kv-head scales); identity
    for full precision.  ``kv_offset``: under TP, the shard's first global
    kv-head index (slices per-head scale tuples shard-locally)."""
    if isinstance(cache, PagedKVCache) and cache.kv_bits == 4:
        # paged int4: per-kv-head (or scalar) scales, adjacent-pair nibble
        # packing.  Per-head scales are folded outside the kernel at read
        # (decode.fold_paged_kv_scales), so the kernel sees raw codes.
        n_loc = k.shape[-2]
        ks = _scale_arr(cache.k_scales[layer], kv_offset, n_loc)
        vs = _scale_arr(cache.v_scales[layer], kv_offset, n_loc)
        k4 = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -7, 7)
        v4 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -7, 7)
        return (pack_int4_rows_adj(k4.astype(jnp.int32)),
                pack_int4_rows_adj(v4.astype(jnp.int32)))
    if getattr(cache, "kv_bits", 8) == 4:
        # scalar or per-kv-head scales; (…, n_kv, hd) broadcast either way
        ks = jnp.asarray(cache.k_scales[layer], jnp.float32)
        vs = jnp.asarray(cache.v_scales[layer], jnp.float32)
        if ks.ndim:
            ks, vs = ks[:, None], vs[:, None]
        k4 = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -7, 7)
        v4 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -7, 7)
        return (pack_int4_rows(k4.astype(jnp.int32)),
                pack_int4_rows(v4.astype(jnp.int32)))
    if cache.kv_storage_dtype != jnp.int8:
        return k.astype(cache.kv_storage_dtype), v.astype(cache.kv_storage_dtype)
    ks, vs = cache.k_scales[layer], cache.v_scales[layer]
    k = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127)
    v = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -127, 127)
    return k.astype(jnp.int8), v.astype(jnp.int8)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ContiguousKVCache:
    """Slot-contiguous cache: ``(n_layers, n_slots, max_len, n_kv, hd)``.

    ``kv_bits=4`` stores nibble-packed int8 with head dim ``n_kv/2``
    (:func:`pack_int4_rows`, head-pair layout); attention must then run
    the two-pass unpack path
    (``ops.contiguous_attention.contiguous_decode_attention_xla4``).
    """

    k: jax.Array
    v: jax.Array
    k_scales: Optional[Tuple[float, ...]] = None  # per-layer int scales
    v_scales: Optional[Tuple[float, ...]] = None
    kv_bits: int = 16  # 16/32 = full precision, 8 = int8, 4 = packed int4

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def kv_storage_dtype(self):
        return self.k.dtype

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def tree_flatten(self):
        return ((self.k, self.v), (self.k_scales, self.v_scales,
                                   self.kv_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def init_contiguous_cache(n_layers: int, n_slots: int, max_len: int, n_kv: int,
                          hd: int, dtype=jnp.bfloat16,
                          k_scales=None, v_scales=None,
                          kv_bits: Optional[int] = None) -> ContiguousKVCache:
    if kv_bits == 4:
        assert n_kv % 2 == 0, (
            "int4 KV packs kv-head pairs; n_kv must be even")
        assert k_scales is not None and v_scales is not None
        shape = (n_layers, n_slots, max_len, n_kv // 2, hd)
        dtype = jnp.int8
    else:
        shape = (n_layers, n_slots, max_len, n_kv, hd)
        kv_bits = 8 * jnp.dtype(dtype).itemsize
    return ContiguousKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                             k_scales, v_scales, kv_bits)


def write_kv_contiguous(
    cache: ContiguousKVCache,
    layer: int,
    k_new: jax.Array,  # (B, N, n_kv, hd) — B must equal n_slots
    v_new: jax.Array,
    positions: jax.Array,  # (B, N) logical positions of the new tokens
) -> ContiguousKVCache:
    k_new, v_new = quantize_kv_write(cache, layer, k_new, v_new)
    b = k_new.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], positions.shape)
    k = cache.k.at[layer, rows, positions].set(k_new)
    v = cache.v.at[layer, rows, positions].set(v_new)
    return cache._replace(k=k, v=v)


def page_offsets(block_tables: jax.Array, positions: jax.Array,
                 page_size: int, pad_mask: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """(B, max_pages) block tables + (B, N) logical positions →
    ``(pages, offsets)`` each (B, N).  With ``pad_mask``, padded tokens are
    steered to page 0 offset 0 (the reserved trash page)."""
    page_idx = positions // page_size  # (B, N)
    offset = positions % page_size
    pages = jnp.take_along_axis(block_tables, page_idx, axis=1)  # (B, N)
    if pad_mask is not None:
        pages = jnp.where(pad_mask, 0, pages)
        offset = jnp.where(pad_mask, 0, offset)
    return pages, offset


def interleave_kv(k: jax.Array, v: jax.Array) -> jax.Array:
    """(…, n_kv, hd) K and V → (…, 2·n_kv, hd) combined rows (K even, V odd)."""
    kv = jnp.stack((k, v), axis=-2)  # (…, n_kv, 2, hd)
    return kv.reshape(*k.shape[:-2], 2 * k.shape[-2], k.shape[-1])


def write_kv(
    cache: PagedKVCache,
    layer: int,
    k_new: jax.Array,  # (B, N, n_kv, hd)
    v_new: jax.Array,
    block_tables: jax.Array,  # (B, max_pages)
    positions: jax.Array,  # (B, N) logical positions of the new tokens
    pad_mask: Optional[jax.Array] = None,  # (B, N) → write to trash page
    kv_offset=None,  # TP: shard's first global kv head (per-head scales)
) -> PagedKVCache:
    k_new, v_new = quantize_kv_write(cache, layer, k_new, v_new,
                                     kv_offset=kv_offset)
    pages, offs = page_offsets(block_tables, positions, cache.page_size,
                               pad_mask)
    b, n, n_kv, hd = k_new.shape
    rows = interleave_kv(k_new, v_new).reshape(b * n, 2 * n_kv, hd)
    return _store_rows(cache, layer, rows, pages.reshape(-1),
                       offs.reshape(-1), dma_path=(n == 1))


def write_kv_flat(
    cache: PagedKVCache,
    layer: int,
    k_new: jax.Array,  # (T, n_kv, hd) — one row per new token
    v_new: jax.Array,
    pages: jax.Array,  # (T,) destination page per token (host-precomputed)
    offs: jax.Array,  # (T,) in-page offset per token
    kv_offset=None,  # TP: shard's first global kv head (per-head scales)
) -> PagedKVCache:
    """Token-flat write for the ragged (mixed prefill+decode) step."""
    k_new, v_new = quantize_kv_write(cache, layer, k_new[:, None],
                                     v_new[:, None], kv_offset=kv_offset)
    t, _, n_kv, hd = k_new.shape
    rows = interleave_kv(k_new[:, 0], v_new[:, 0])
    return _store_rows(cache, layer, rows, pages, offs, dma_path=False)


def _store_rows(cache, layer, rows, pg, of, dma_path: bool):
    n_kv2, hd = rows.shape[1], rows.shape[2]
    sublane = {4: 8, 2: 16, 1: 32}[jnp.dtype(rows.dtype).itemsize]
    if (dma_path and jax.default_backend() == "tpu"
            and hd % 128 == 0 and n_kv2 % sublane == 0):
        # decode hot path: one DMA per row instead of XLA's scatter lowering
        # (row shape must be DMA-tileable: 128 lanes, a full sublane tile
        # for the storage dtype).  Many-token writes (prefill/ragged) use
        # the scatter — row-at-a-time DMAs are latency-bound there.
        from gptq_v2_tpu.ops.paged_write import paged_write_rows

        return cache._replace(
            kv=paged_write_rows(cache.kv, layer, rows, pg, of))
    # one contiguous (2·n_kv, hd) row per token — a row scatter
    return cache._replace(kv=cache.kv.at[layer, pg, of].set(rows))


def gather_kv(
    cache: PagedKVCache,
    layer: int,
    block_tables: jax.Array,  # (B, max_pages)
) -> Tuple[jax.Array, jax.Array]:
    """Assemble each sequence's K/V: (B, max_pages·page_size, n_kv, hd).

    The **jnp reference twin** of the Pallas ragged-paged-attention kernel's
    in-kernel page streaming (``ops/paged_attention.py``) — the off-TPU /
    debugging path.  Entries past a sequence's length are garbage; the
    attention mask (``seq_lens``) must exclude them.
    """
    ps = cache.page_size
    b, mp = block_tables.shape
    n_comb, hd = cache.kv.shape[3], cache.kv.shape[4]
    pages = jnp.take(cache.kv[layer], block_tables, axis=0)  # (B, mp, ps, 2kv, hd)
    seq = pages.reshape(b, mp * ps, n_comb, hd)
    return seq[:, :, 0::2], seq[:, :, 1::2]
