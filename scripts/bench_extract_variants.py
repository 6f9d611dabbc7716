"""w4a16 kernel anatomy: where does the last 26% vs the Pallas ceiling go?

Round-3 measured the production kernel at ~74% of the same-epoch Pallas
stream ceiling and attributed the gap to nibble-extraction VPU time not
hidden under DMA.  This script decomposes that claim and tests fixes:

  probes
  ------
  * ceiling   — trivial Pallas block-stream kernel (same-epoch upper bound)
  * prod      — production kernel (plane-per-group int32, 8x shift+mask+cvt)
  * dma-only  — identical grid/specs, compute replaced by an 8-row touch:
                isolates the DMA floor for this exact block layout
  * compute   — weight index_map pinned to block 0 (Pallas skips re-fetch
                on unchanged consecutive indices): isolates VPU+MXU time
  * noshift   — extraction replaced by one add+convert per plane: isolates
                the shift+mask cost vs the convert cost

  candidate fixes
  ---------------
  * uint4     — weights stored as jnp.uint4 (hardware 4-bit unpack:
                ``.astype(bf16)`` is one convert, no shifts/masks)
  * int8pair  — two codes per int8 byte, 5 VPU ops per 2 weights

All timings: chained distinct-weight ops inside one jit, best-of-N
sustained windows (the tunnel dispatch RTT otherwise dominates).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from gptq_v2_tpu.ops.packing import PackedLinear, pack_codes
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul


def best_window(fn, sync, reps=6, rounds=4):
    fn(); sync()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            fn()
        sync()
        best = min(best, (time.time() - t0) / reps)
    return best


# ---------------------------------------------------------------- ceiling
def _stream_kernel(x_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += x_ref[:].astype(jnp.float32).sum(axis=0, keepdims=True)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm",))
def pallas_stream(x, bm: int):
    m, n = x.shape
    n_k = m // bm
    return pl.pallas_call(
        functools.partial(_stream_kernel, n_k=n_k),
        grid=(n_k,),
        in_specs=[pl.BlockSpec((bm, n), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
    )(x)


def run_ceiling():
    n = 2048
    m = 3 * (1 << 30) // (4 * n)
    x = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.key(0), (m, n), jnp.uint32), jnp.int32)
    out = None

    def go():
        nonlocal out
        out = pallas_stream(x, 256)

    dt = best_window(go, lambda: np.asarray(out), reps=3)
    bw = x.nbytes / dt / 1e9
    print(f"ceiling (pallas stream): {bw:6.1f} GB/s", file=sys.stderr,
          flush=True)
    del x
    return bw


# ------------------------------------------------------- kernel variants
def _kernel_var(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, group_size,
                n_k, mode):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    code_dt = jnp.bfloat16

    if mode == "dma":
        # touch 8 rows so the read can't be elided; no extraction, no dots
        acc_ref[0:8, :] += w_ref[0:8, :].astype(jnp.float32)
    else:
        words = w_ref[:]
        acc = acc_ref[:]
        for i in range(8):
            if mode == "noshift":
                codes = (words + i).astype(code_dt)  # no shift/mask
            else:
                codes = ((words >> (4 * i)) & 15).astype(code_dt)
            x_i = x_ref[:, i * g:(i + 1) * g].astype(code_dt)
            dot = jax.lax.dot_general(
                x_i, codes, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x_sum = jnp.sum(x_i.astype(jnp.float32), axis=1, keepdims=True)
            acc += dot * s_ref[i, :][None, :].astype(jnp.float32) \
                - x_sum * zs_ref[i, :][None, :].astype(jnp.float32)
        acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n", "mode"))
def w4a16_var(x, qweight, scales, zeros, group_size: int, block_n: int,
              mode: str):
    b, c_pad = x.shape
    _, r = qweight.shape
    g = group_size
    bk = 8 * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    zs = (zeros.astype(jnp.float32) * scales.astype(jnp.float32)
          ).astype(scales.dtype)
    kernel = functools.partial(_kernel_var, group_size=g, n_k=n_k, mode=mode)
    if mode == "compute":
        w_map = lambda i, j, k: (0, j)  # pinned: no re-fetch across k
    else:
        w_map = lambda i, j, k: (k, j)
    return pl.pallas_call(
        kernel,
        grid=(1, n_j, n_k),
        in_specs=[
            pl.BlockSpec((b, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )(x, qweight, scales, zs)


# ------------------------------------------------- uint4 hardware unpack
def _kernel_u4(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, group_size,
               n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    acc = acc_ref[:]
    for i in range(8):
        codes = w_ref[i * g:(i + 1) * g, :].astype(jnp.bfloat16)
        x_i = x_ref[:, i * g:(i + 1) * g].astype(jnp.bfloat16)
        dot = jax.lax.dot_general(
            x_i, codes, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x_sum = jnp.sum(x_i.astype(jnp.float32), axis=1, keepdims=True)
        acc += dot * s_ref[i, :][None, :].astype(jnp.float32) \
            - x_sum * zs_ref[i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n"))
def w4a16_u4(x, w4, scales, zeros, group_size: int, block_n: int):
    b, c_pad = x.shape
    _, r = w4.shape
    g = group_size
    bk = 8 * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    zs = (zeros.astype(jnp.float32) * scales.astype(jnp.float32)
          ).astype(scales.dtype)
    kernel = functools.partial(_kernel_u4, group_size=g, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(1, n_j, n_k),
        in_specs=[
            pl.BlockSpec((b, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )(x, w4, scales, zs)


# ------------------------------------------------------------ int8 pairs
def _kernel_i8(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, group_size,
               n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    acc = acc_ref[:]
    for p in range(4):  # byte-slab p holds groups 2p (lo nibble), 2p+1 (hi)
        bytes_ = w_ref[p * g:(p + 1) * g, :]
        for h, codes in ((0, bytes_ & 15), (1, (bytes_ >> 4) & 15)):
            i = 2 * p + h
            codes = codes.astype(jnp.bfloat16)
            x_i = x_ref[:, i * g:(i + 1) * g].astype(jnp.bfloat16)
            dot = jax.lax.dot_general(
                x_i, codes, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x_sum = jnp.sum(x_i.astype(jnp.float32), axis=1, keepdims=True)
            acc += dot * s_ref[i, :][None, :].astype(jnp.float32) \
                - x_sum * zs_ref[i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n"))
def w4a16_i8(x, w8, scales, zeros, group_size: int, block_n: int):
    b, c_pad = x.shape
    _, r = w8.shape
    g = group_size
    bk = 8 * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    zs = (zeros.astype(jnp.float32) * scales.astype(jnp.float32)
          ).astype(scales.dtype)
    kernel = functools.partial(_kernel_i8, group_size=g, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(1, n_j, n_k),
        in_specs=[
            pl.BlockSpec((b, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * g, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )(x, w8, scales, zs)


def make_all(key, c, r, g=128):
    """One logical quantized weight in every storage format."""
    c_pad = -(-c // (8 * g)) * (8 * g)
    n_g = c_pad // g
    k1, k2, k3 = jax.random.split(key, 3)
    codes = np.asarray(jax.random.randint(k1, (r, c_pad), 0, 16,
                                          jnp.int32)).astype(np.uint8)
    scales = np.asarray((jax.random.uniform(k2, (n_g, r), jnp.float32) + 0.5)
                        * (0.2 / np.sqrt(c))).astype(np.float32)
    zeros = np.asarray(jax.random.randint(k3, (n_g, r), 0, 16)
                       ).astype(np.float32)
    packed = pack_codes(codes, g)  # (c_pad/8, r) int32 plane-per-group
    p = PackedLinear(qweight=jnp.asarray(packed),
                     scales=jnp.asarray(scales, jnp.bfloat16),
                     zeros=jnp.asarray(zeros, jnp.bfloat16),
                     perm=None, group_size=g, in_features=c)
    # host-side asarray(dtype=uint4) trips a dispatch recursion on the axon
    # runtime; convert on device inside an explicit jit instead
    w4 = jax.jit(lambda a: a.astype(jnp.uint4))(
        jnp.asarray(codes.T, dtype=jnp.int32))  # (c_pad, r) natural order
    # byte pairs: byte-slab p row j col n packs groups (2p, 2p+1):
    # lo nibble = code[group 2p, row j], hi = code[group 2p+1, row j]
    ct = codes.T.reshape(n_g // 8, 8, g, r)  # (blocks, group-in-block, g, r)
    lo = ct[:, 0::2]
    hi = ct[:, 1::2]
    w8 = (lo | (hi << 4)).astype(np.uint8).reshape(c_pad // 2, r)
    w8 = jnp.asarray(w8.astype(np.int8))
    return p, w4, w8


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ceil = run_ceiling()

    c = r = 4096
    g = 128
    n_layers = 12
    repeat = 16
    keys = jax.random.split(jax.random.key(1), n_layers)
    stores = [make_all(k, c, r) for k in keys]
    packs = [s[0] for s in stores]
    wbytes = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes
                 for p in packs)
    n_ops = n_layers * repeat

    for b in (32, 128):
        x0 = jnp.full((b, c), 0.01, jnp.bfloat16)

        def timed(label, step, wb=wbytes, check_ref=None):
            def chain(x):
                for _ in range(repeat):
                    for st in stores:
                        x = step(x, st) * 1e-2
                return x

            f = jax.jit(chain)
            out = None

            def go():
                nonlocal out
                out = f(x0)

            try:
                dt = best_window(go, lambda: np.asarray(out.ravel()[:1]))
            except Exception as e:
                print(f"  b={b:3d} {label:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
                return None
            res = np.asarray(out)
            err = ""
            if check_ref is not None:
                e = float(np.max(np.abs(res.astype(np.float32) - check_ref)
                                 / (np.abs(check_ref) + 1e-3)))
                err = f"  relerr={e:.1e}"
            print(f"  b={b:3d} {label:12s} {dt / n_ops * 1e3:7.3f} ms/op  "
                  f"{wb * repeat / dt / 1e9:6.1f} GB/s "
                  f"({wb * repeat / dt / 1e9 / ceil * 100:5.1f}% ceil){err}",
                  file=sys.stderr, flush=True)
            return res

        ref = timed("prod", lambda x, st: w4a16_matmul(x, st[0]))
        reff = None if ref is None else ref.astype(np.float32)
        timed("dma-only", lambda x, st: w4a16_var(
            x, st[0].qweight, st[0].scales, st[0].zeros, g, 2048, "dma"))
        timed("compute", lambda x, st: w4a16_var(
            x, st[0].qweight, st[0].scales, st[0].zeros, g, 2048, "compute"))
        timed("noshift", lambda x, st: w4a16_var(
            x, st[0].qweight, st[0].scales, st[0].zeros, g, 2048, "noshift"))
        timed("uint4", lambda x, st: w4a16_u4(
            x, st[1], st[0].scales, st[0].zeros, g, 2048),
            wb=sum(s[1].nbytes + s[0].scales.nbytes + s[0].zeros.nbytes
                   for s in stores), check_ref=reff)
        timed("int8pair", lambda x, st: w4a16_i8(
            x, st[2], st[0].scales, st[0].zeros, g, 2048),
            wb=sum(s[2].nbytes + s[0].scales.nbytes + s[0].zeros.nbytes
                   for s in stores), check_ref=reff)


if __name__ == "__main__":
    main()
