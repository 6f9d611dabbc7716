"""Pallas paged KV-cache row writer.

Scatters one token's interleaved K/V row ``(2·n_kv, hd)`` per sequence into
the page pool at ``(page, offset)`` — the decode-step cache write.  XLA's
scatter lowers this to ~0.87 ms for 64 rows (1 MB) on v5e; this kernel
issues one HBM→HBM DMA per row from a scalar-prefetched (page, offset)
table and runs at copy speed.  In-place via input/output aliasing (the
caller donates the pool).

jnp twin: ``serving.kv_cache.write_kv``'s scatter path (used off-TPU and as
the test oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_QUEUES = 8  # spread row DMAs over semaphores → parallel DMA queues


def _write_kernel(n_tokens, layer, pg_ref, of_ref, rows_ref, kv_in_ref,
                  kv_out_ref, sems):
    del kv_in_ref  # aliased with kv_out_ref; present only for the alias
    copies = [
        pltpu.make_async_copy(
            rows_ref.at[t],
            kv_out_ref.at[layer, pg_ref[t], of_ref[t]],
            sems.at[t % N_QUEUES],
        )
        for t in range(n_tokens)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def paged_write_rows(
    kv_pages: jax.Array,  # (n_layers, n_pages, page_size, 2·n_kv, hd)
    layer: int,  # static
    rows: jax.Array,  # (T, 2·n_kv, hd) interleaved K/V rows
    pages: jax.Array,  # (T,) int32 destination page per token
    offsets: jax.Array,  # (T,) int32 in-page offset per token
) -> jax.Array:
    """Returns the updated pool (in place via aliasing; trace-safe inside an
    outer jit — the pool buffer must be dead after this call)."""
    n_tokens = rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # rows (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # kv_pages (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_QUEUES,))],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, n_tokens, layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        input_output_aliases={3: 0},  # kv_pages (after 2 scalar args + rows)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(pages.astype(jnp.int32), offsets.astype(jnp.int32), rows, kv_pages)
