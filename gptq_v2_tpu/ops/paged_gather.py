"""Pallas paged KV gather: assemble per-sequence K/V from the page pool.

Each (sequence, page) grid step is a whole-page block copy whose source
block index comes from the scalar-prefetched block table — pipelined DMA
at page granularity.

Measured on v5e it ties XLA's row gather (~280 GB/s read+write at paged-
attention shapes): the gather is copy-bound either way, which is why the
serving default is the gather-free contiguous cache.  This kernel is kept
as the scalar-prefetch building block for a future *fused* paged-attention
kernel (where the copy disappears into the softmax loop), with its
equivalence test.

jnp twin: ``serving.kv_cache.gather_kv``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(bt_ref, k_ref, v_ref, ko_ref, vo_ref):
    del bt_ref  # consumed by the index maps
    ko_ref[:] = k_ref[:].reshape(ko_ref.shape)  # (1,ps,kv,hd) -> (1,1,ps,kv,hd)
    vo_ref[:] = v_ref[:].reshape(vo_ref.shape)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_gather_kv(
    k_pool: jax.Array,  # (n_pages * page_size, n_kv, hd)
    v_pool: jax.Array,
    block_tables: jax.Array,  # (B, max_pages) int32
    page_size: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """K/V per sequence: ``(B, max_pages * page_size, n_kv, hd)``."""
    ps = page_size
    n_slots, n_kv, hd = k_pool.shape
    b, mp = block_tables.shape
    kp = k_pool.reshape(n_slots // ps, ps, n_kv, hd)
    vp = v_pool.reshape(n_slots // ps, ps, n_kv, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, mp),
        in_specs=[
            pl.BlockSpec((1, ps, n_kv, hd),
                         lambda i, p, bt: (bt[i, p], 0, 0, 0)),
            pl.BlockSpec((1, ps, n_kv, hd),
                         lambda i, p, bt: (bt[i, p], 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ps, n_kv, hd),
                         lambda i, p, bt: (i, p, 0, 0, 0)),
            pl.BlockSpec((1, 1, ps, n_kv, hd),
                         lambda i, p, bt: (i, p, 0, 0, 0)),
        ],
    )
    ko, vo = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, ps, n_kv, hd), k_pool.dtype),
            jax.ShapeDtypeStruct((b, mp, ps, n_kv, hd), v_pool.dtype),
        ],
        interpret=interpret,
    )(block_tables.astype(jnp.int32), kp, vp)
    return (ko.reshape(b, mp * ps, n_kv, hd),
            vo.reshape(b, mp * ps, n_kv, hd))
