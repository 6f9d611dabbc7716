"""Paged KV cache (new capability; the reference has no serving stack).

Pages decouple HBM allocation from sequence length so a continuous-batching
engine can mix long and short sequences without padding the cache itself.
Layout per layer: ``(n_pages · page_size, n_kv_heads, head_dim)`` — a flat
token pool; a sequence's logical position ``t`` lives at flat slot
``block_table[t // page_size] · page_size + t % page_size``.

All functions are pure/jittable; free-page bookkeeping is host-side in the
engine.  Attention reads go through :func:`gather_kv` (gather-based paged
attention; a fused Pallas paged-attention kernel can drop in behind the same
interface).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    k: jax.Array  # (n_layers, n_pages * page_size, n_kv, hd)
    v: jax.Array  # same
    page_size: int  # static

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def tree_flatten(self):
        return ((self.k, self.v), (self.page_size,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def init_cache(n_layers: int, n_pages: int, page_size: int, n_kv: int, hd: int,
               dtype=jnp.bfloat16) -> PagedKVCache:
    shape = (n_layers, n_pages * page_size, n_kv, hd)
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), page_size)


def flat_slots(block_tables: jax.Array, positions: jax.Array, page_size: int) -> jax.Array:
    """(B, max_pages) block tables + (B, N) logical positions → flat slots."""
    page_idx = positions // page_size  # (B, N)
    offset = positions % page_size
    pages = jnp.take_along_axis(block_tables, page_idx, axis=1)  # (B, N)
    return pages * page_size + offset


def write_kv(
    cache: PagedKVCache,
    layer: int,
    k_new: jax.Array,  # (B, N, n_kv, hd)
    v_new: jax.Array,
    block_tables: jax.Array,  # (B, max_pages)
    positions: jax.Array,  # (B, N) logical positions of the new tokens
) -> PagedKVCache:
    slots = flat_slots(block_tables, positions, cache.page_size).reshape(-1)
    b, n, n_kv, hd = k_new.shape
    k = cache.k.at[layer, slots].set(k_new.reshape(b * n, n_kv, hd))
    v = cache.v.at[layer, slots].set(v_new.reshape(b * n, n_kv, hd))
    return cache._replace(k=k, v=v)


def gather_kv(
    cache: PagedKVCache,
    layer: int,
    block_tables: jax.Array,  # (B, max_pages)
) -> Tuple[jax.Array, jax.Array]:
    """Assemble each sequence's K/V: (B, max_pages·page_size, n_kv, hd).

    Entries past a sequence's length are garbage; the attention mask
    (``seq_lens``) must exclude them.
    """
    ps = cache.page_size
    b, mp = block_tables.shape
    n_kv, hd = cache.k.shape[2], cache.k.shape[3]
    base = block_tables[:, :, None] * ps + jnp.arange(ps)[None, None, :]
    slots = base.reshape(b, mp * ps)
    k = jnp.take(cache.k[layer], slots, axis=0)  # (B, mp*ps, n_kv, hd)
    v = jnp.take(cache.v[layer], slots, axis=0)
    return k, v
