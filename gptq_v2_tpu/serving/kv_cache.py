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
  ``(n_pages · page_size, n_kv_heads, head_dim)``; logical position ``t``
  lives at flat slot ``block_table[t // page_size] · page_size +
  t % page_size``.  Attention assembles K/V via :func:`gather_kv`.

All functions are pure/jittable; free-slot/page bookkeeping is host-side in
the engine.
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ContiguousKVCache:
    """Slot-contiguous cache: ``(n_layers, n_slots, max_len, n_kv, hd)``."""

    k: jax.Array
    v: jax.Array

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def tree_flatten(self):
        return ((self.k, self.v), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_contiguous_cache(n_layers: int, n_slots: int, max_len: int, n_kv: int,
                          hd: int, dtype=jnp.bfloat16) -> ContiguousKVCache:
    shape = (n_layers, n_slots, max_len, n_kv, hd)
    return ContiguousKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def write_kv_contiguous(
    cache: ContiguousKVCache,
    layer: int,
    k_new: jax.Array,  # (B, N, n_kv, hd) — B must equal n_slots
    v_new: jax.Array,
    positions: jax.Array,  # (B, N) logical positions of the new tokens
) -> ContiguousKVCache:
    b = k_new.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], positions.shape)
    k = cache.k.at[layer, rows, positions].set(k_new)
    v = cache.v.at[layer, rows, positions].set(v_new)
    return cache._replace(k=k, v=v)


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
    (``seq_lens``) must exclude them.  (A Pallas page-block copy kernel,
    ``ops/paged_gather.py``, measures identical to this XLA gather —
    ~280 GB/s r+w on v5e; the gather itself is copy-bound either way,
    which is why the gather-free contiguous cache is the default layout.)
    """
    ps = cache.page_size
    b, mp = block_tables.shape
    n_kv, hd = cache.k.shape[2], cache.k.shape[3]
    base = block_tables[:, :, None] * ps + jnp.arange(ps)[None, None, :]
    slots = base.reshape(b, mp * ps)
    k = jnp.take(cache.k[layer], slots, axis=0)  # (B, mp*ps, n_kv, hd)
    v = jnp.take(cache.v[layer], slots, axis=0)
    return k, v
