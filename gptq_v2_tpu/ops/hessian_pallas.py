"""Pallas TPU kernel: symmetric Hessian accumulation ``H += XᵀX``.

TPU-native equivalent of the reference's Triton symmetric-GEMM kernel
(``gptq_triton/accumulate_hessian.py:56-131``) and CUTLASS GEMM
(``package/gptq/accumulate_hessian_kernel.cu:10-64``):

* fp32 accumulation on the MXU from bf16/fp16/fp32 activations,
* **exploits symmetry**: the grid enumerates only lower-triangle tile pairs
  (incl. full diagonal tiles) via scalar-prefetched ``(i, j)`` index arrays —
  ~2× FLOP saving; the stale upper triangle is repaired once at read time by
  :func:`symmetrize` (instead of per-tile mirrored stores, which Pallas
  block-output mapping cannot express — cheaper anyway since accumulation
  happens many times per inversion),
* in-place update of ``H`` via ``input_output_aliases`` so unvisited upper
  tiles keep their previous contents.

The jnp twin for correctness tests is ``quant.hessian.accumulate`` with
``use_kernel=False``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(i_arr, j_arr, h_ref, xa_ref, xb_ref, out_ref):
    del i_arr, j_arr  # consumed by the index maps
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = h_ref[:]

    # fp32 inputs must not be demoted to bf16 on the MXU — mirrors the
    # reference's TF32-off contract (reference main.py:12-13).  bf16 inputs
    # use the native bf16×bf16→fp32 MXU path (an fp32 precision flag on bf16
    # operands is rejected by Mosaic).
    precision = (jax.lax.Precision.HIGHEST if xa_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out_ref[:] += jax.lax.dot_general(
        xa_ref[:], xb_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract token rows
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _lower_triangle_pairs(nb: int):
    pairs = [(i, j) for i in range(nb) for j in range(i + 1)]
    i_arr = np.asarray([p[0] for p in pairs], dtype=np.int32)
    j_arr = np.asarray([p[1] for p in pairs], dtype=np.int32)
    return i_arr, j_arr


@functools.partial(jax.jit, static_argnames=("block_d", "block_t", "interpret"))
def _accumulate_hessian_lower(h, x, block_d: int, block_t: int, interpret: bool):
    t, d = x.shape
    nb = d // block_d
    nk = t // block_t
    i_arr, j_arr = _lower_triangle_pairs(nb)
    n_pairs = len(i_arr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pairs, nk),
        in_specs=[
            pl.BlockSpec(
                (block_d, block_d),
                lambda l, k, i_arr, j_arr: (i_arr[l], j_arr[l]),
            ),
            pl.BlockSpec(
                (block_t, block_d),
                lambda l, k, i_arr, j_arr: (k, i_arr[l]),
            ),
            pl.BlockSpec(
                (block_t, block_d),
                lambda l, k, i_arr, j_arr: (k, j_arr[l]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_d, block_d),
            lambda l, k, i_arr, j_arr: (i_arr[l], j_arr[l]),
        ),
    )
    flops = 2 * t * d * d // 2 + t * d * d // 2
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        input_output_aliases={2: 0},  # alias h (first tensor arg after 2 scalars)
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * t * d * x.dtype.itemsize + d * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(i_arr, j_arr, h, x, x)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


def accumulate_hessian(
    h: jax.Array,  # (D, D) fp32 — lower triangle + diagonal are authoritative
    x: jax.Array,  # (T, D) bf16/fp16/fp32 activations
    block_d: int = 512,
    block_t: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """Accumulate ``XᵀX`` into the lower triangle (+ diagonal tiles) of ``h``.

    The returned array's strict-upper tile region is stale; call
    :func:`symmetrize` before consuming ``h`` as a full matrix.  Zero-pads
    ``T`` (zero rows contribute nothing).

    The kernel is HBM-bound with arithmetic intensity ``block_d/2`` flop
    per byte of X, so wide tiles matter: 512x512 measured 1.4x over
    256x256 on v5e (block 1024 exceeds the 16 MB scoped-VMEM stack).
    ``D`` not divisible by ``block_d`` (e.g. Llama's 11008) is handled by
    zero-padding the feature axis and slicing the result — zero columns
    contribute zero, and the pad/slice copies cost ~1% of the kernel time.
    Small ``D`` (< 128 granularity) falls back to one full-``D`` tile,
    which Mosaic always accepts.
    """
    t, d = x.shape
    block_d = min(block_d, d)
    if x.dtype == jnp.float16:
        # fp16 matmuls are not native on the MXU; bf16 keeps fp32 accumulation
        # and adds only ~2^-8 relative input noise, negligible after damping.
        x = x.astype(jnp.bfloat16)
    # Scoped-VMEM cap: two double-buffered (block_t, block_d) x-tiles plus
    # the aliased H tile must fit the 16 MiB stack budget.  bf16 (the
    # production path) keeps block_t=1024; f32 activations (numerics tests
    # and oracles) measured 20.2 MiB there and failed to compile.
    itemsize = jnp.dtype(x.dtype).itemsize
    while (block_t > 256
           and (4 * block_t * block_d * itemsize
                + 3 * block_d * block_d * 4) > (8 << 20)):
        block_t //= 2
    x = _pad_to(x, 0, block_t)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if d < 128:
        block_d = d  # full-dim tile (block == array dim is always legal)
    elif d % block_d != 0:
        d_pad = -(-d // block_d) * block_d
        x = _pad_to(x, 1, block_d)
        h_pad = jnp.pad(h, ((0, d_pad - d), (0, d_pad - d)))
        out = _accumulate_hessian_lower(h_pad, x, block_d=block_d,
                                        block_t=block_t, interpret=interpret)
        return out[:d, :d]
    return _accumulate_hessian_lower(h, x, block_d=block_d, block_t=block_t,
                                     interpret=interpret)


def symmetrize(h: jax.Array, block_d: int = 256) -> jax.Array:
    """Repair the stale upper-tile triangle: ``H[r, c] = H[c, r]`` wherever
    column-tile > row-tile.  Diagonal tiles were computed fully and are
    already correct."""
    d = h.shape[0]
    while d % block_d != 0:
        block_d //= 2
    r = jnp.arange(d) // block_d
    mask = r[None, :] > r[:, None]  # col tile strictly right of row tile
    return jnp.where(mask, h.T, h)
