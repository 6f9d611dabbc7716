"""Pallas streaming ceiling + w4a16 DMA-size sweep.

Two questions, one chip session:

1. What HBM read bandwidth can a *Pallas grid kernel* sustain (vs the
   XLA-reduce probe ceiling in ``bench_hbm.py``)?  A kernel that just
   DMAs ``(bm, bn)`` int32 blocks and folds them into a VMEM accumulator
   — the upper bound for any Pallas weight-streaming kernel here.
2. Does enlarging the w4a16 kernel's per-step DMA (multiple quantization
   k-groups per grid step, ``kpg``) close the gap between its measured
   weight stream (~350 GB/s) and that ceiling?

All timings are best-of-N sustained windows with one device sync per
window (same methodology as bench_hbm / bench.py).
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

from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul


def best_window(fn, sync, reps=8, rounds=4):
    fn(); sync()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            fn()
        sync()
        best = min(best, (time.time() - t0) / reps)
    return best


# ---------------------------------------------------------------- stream
def _stream_kernel(x_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # cheapest fold that forces the read: one vector add per block row-slab
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


def run_stream():
    n = 2048
    gib = 3
    m = gib * (1 << 30) // (4 * n)
    x = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.key(0), (m, n), jnp.uint32), jnp.int32)
    nbytes = x.nbytes
    print(f"stream array {nbytes / 2**30:.1f} GiB", file=sys.stderr, flush=True)
    for bm in (128, 256, 512):
        out = None

        def go():
            nonlocal out
            out = pallas_stream(x, bm)

        dt = best_window(go, lambda: np.asarray(out), reps=3)
        print(f"  pallas stream bm={bm:5d} ({bm * n * 4 / 2**20:5.1f} MiB/step):"
              f" {nbytes / dt / 1e9:6.1f} GB/s", file=sys.stderr, flush=True)
    # XLA reduce twin on the same array
    red = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    out = None

    def go():
        nonlocal out
        out = red(x)

    dt = best_window(go, lambda: np.asarray(out), reps=3)
    print(f"  xla reduce same array:       {nbytes / dt / 1e9:6.1f} GB/s",
          file=sys.stderr, flush=True)


# ---------------------------------------------------------------- w4a16 kpg
def _kernel_kpg(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, group_size,
                n_k, bits, kpg):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    planes, mask = 32 // bits, (1 << bits) - 1
    code_dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    acc = acc_ref[:]
    for kg in range(kpg):
        words = w_ref[kg * g:(kg + 1) * g, :]
        for i in range(planes):
            codes = ((words >> (bits * i)) & mask).astype(code_dt)
            x_i = x_ref[:, (kg * planes + i) * g:(kg * planes + i + 1) * g
                        ].astype(code_dt)
            dot = jax.lax.dot_general(
                x_i, codes, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x_sum = jnp.sum(x_i.astype(jnp.float32), axis=1, keepdims=True)
            acc += dot * s_ref[kg * planes + i, :][None, :].astype(jnp.float32) \
                - x_sum * zs_ref[kg * planes + i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n", "kpg"))
def w4a16_kpg(x, qweight, scales, zeros, group_size: int, block_n: int,
              kpg: int):
    b, c_pad = x.shape
    _, r = qweight.shape
    g = group_size
    planes = 32 // 4
    bk = kpg * planes * g
    n_k = c_pad // bk
    n_j = pl.cdiv(r, block_n)
    zs = (zeros.astype(jnp.float32) * scales.astype(jnp.float32)
          ).astype(scales.dtype)
    kernel = functools.partial(_kernel_kpg, group_size=g, n_k=n_k, bits=4,
                               kpg=kpg)
    return pl.pallas_call(
        kernel,
        grid=(1, n_j, n_k),
        in_specs=[
            pl.BlockSpec((b, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * g, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * planes, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpg * planes, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
    )(x, qweight, scales, zs)


def make_packed(key, c, r, g=128):
    c_pad = -(-c // (8 * g)) * (8 * g)
    n_g = c_pad // g
    k1, k2, k3 = jax.random.split(key, 3)
    qweight = jax.lax.bitcast_convert_type(
        jax.random.bits(k1, (c_pad // 8, r), jnp.uint32), jnp.int32)
    scales = ((jax.random.uniform(k2, (n_g, r), jnp.float32) + 0.5)
              * (0.2 / np.sqrt(c))).astype(jnp.bfloat16)
    zeros = jax.random.randint(k3, (n_g, r), 0, 16).astype(jnp.bfloat16)
    return PackedLinear(qweight=qweight, scales=scales, zeros=zeros,
                        perm=None, group_size=g, in_features=c)


def run_w4a16(n_layers=12, repeat=16):
    """Chained distinct-weight matmuls, the chain looped ``repeat`` times
    inside ONE jit dispatch — the tunnel's ~3.3 ms dispatch RTT otherwise
    swamps device time entirely (12 ops x ~35 us ideal = 0.4 ms device;
    earlier single-chain numbers measured the tunnel, not the kernel)."""
    c = r = 4096
    keys = jax.random.split(jax.random.key(1), n_layers)
    packs = [make_packed(k, c, r) for k in keys]
    wbytes = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes
                 for p in packs)
    n_ops = n_layers * repeat

    for b in (32, 128):
        x0 = jnp.full((b, c), 0.01, jnp.bfloat16)

        def chain_prod(x):
            for _ in range(repeat):
                for p in packs:
                    x = w4a16_matmul(x, p) * 1e-2
            return x

        f = jax.jit(chain_prod)
        out = None

        def go():
            nonlocal out
            out = f(x0)

        dt = best_window(go, lambda: np.asarray(out.ravel()[:1]), reps=4)
        ref = np.asarray(out)
        print(f"  b={b:3d} prod (bn=2048, kpg=1):  {dt / n_ops * 1e3:7.3f}"
              f" ms/op  {wbytes * repeat / dt / 1e9:6.1f} GB/s",
              file=sys.stderr, flush=True)

        for kpg in (2, 4):
            for bn in (2048,):

                def chain_kpg(x, kpg=kpg, bn=bn):
                    for _ in range(repeat):
                        for p in packs:
                            x = w4a16_kpg(x.astype(jnp.bfloat16), p.qweight,
                                          p.scales, p.zeros, 128, bn,
                                          kpg) * 1e-2
                    return x

                fk = jax.jit(chain_kpg)
                out2 = None

                def go2():
                    nonlocal out2
                    out2 = fk(x0)

                dt = best_window(go2, lambda: np.asarray(out2.ravel()[:1]),
                                 reps=4)
                err = float(np.max(np.abs(np.asarray(out2, np.float32) - ref)
                                   / (np.abs(ref) + 1e-3)))
                print(f"  b={b:3d} kpg={kpg} bn={bn}:        "
                      f"{dt / n_ops * 1e3:7.3f} ms/op  "
                      f"{wbytes * repeat / dt / 1e9:6.1f} GB/s  "
                      f"relerr={err:.1e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    run_stream()
    run_w4a16()
