"""W4A16 kernel dot-layout experiments (device-time-dominated chains).

Variants at (B=128, 4096->4096), n=40-op chains so device time >> the
~3.5 ms per-dispatch cost of the tunneled runtime:

* prod      — the production kernel (8 plane dots, contraction g)
* bigdot    — extract+scale all 8 planes into one (8g, bn) VMEM tile,
              ONE MXU dot with contraction 8g = 1024
* tdot      — transposed streaming: codes (bn, g) as LHS (1024 rows stream
              through the MXU against a (g, bm) stationary x^T)
* dense     — XLA bf16 matmul (roof reference)
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

D = 4096
B = 128
G = 128
N = 40


def best_window(fn, args, reps=4, rounds=4):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.device_get(out.ravel()[:1]))
        best = min(best, (time.time() - t0) / reps)
    return best


def make_parts(key, c=D, r=D, g=G):
    c_pad = -(-c // (8 * g)) * (8 * g)
    n_g = c_pad // g
    k1, k2, k3 = jax.random.split(key, 3)
    qweight = jax.lax.bitcast_convert_type(
        jax.random.bits(k1, (c_pad // 8, r), jnp.uint32), jnp.int32)
    scales = ((jax.random.uniform(k2, (n_g, r), jnp.float32) + 0.5)
              * (0.2 / np.sqrt(c))).astype(jnp.bfloat16)
    zeros = jax.random.randint(k3, (n_g, r), 0, 16).astype(jnp.bfloat16)
    return qweight, scales, zeros


# ---------------------------------------------------------------- bigdot ---
def _k_bigdot(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, cs_scr, *,
              g, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]  # (g, bn) int32
    for i in range(8):
        codes = ((words >> (4 * i)) & 15).astype(jnp.bfloat16)
        cs_scr[pl.ds(i * g, g), :] = codes * s_ref[i, :][None, :]
    xs = x_ref[:]  # (bm, 8g) bf16
    acc = acc_ref[:] + jax.lax.dot_general(
        xs, cs_scr[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for i in range(8):
        xsum = jnp.sum(xs[:, i * g:(i + 1) * g].astype(jnp.float32),
                       axis=1, keepdims=True)
        acc = acc - xsum * zs_ref[i, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def bigdot(x, qw, s, z, block_n=1024):
    b, c_pad = x.shape
    _, r = qw.shape
    g = G
    bk = 8 * g
    n_k = c_pad // bk
    zs = (z.astype(jnp.float32) * s.astype(jnp.float32)).astype(s.dtype)
    return pl.pallas_call(
        functools.partial(_k_bigdot, g=g, n_k=n_k),
        grid=(1, r // block_n, n_k),
        in_specs=[
            pl.BlockSpec((b, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((g, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((8, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32),
                        pltpu.VMEM((bk, block_n), jnp.bfloat16)],
    )(x, qw, s, zs)


# ------------------------------------------------------------------ tdot ---
def _k_tdot(xt_ref, wt_ref, s_ref, zs_ref, out_ref, acc_ref, *, g, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = wt_ref[:]  # (bn, g) int32 — transposed packing
    s_all = s_ref[:].astype(jnp.float32)   # (bn, G_total)
    zs_all = zs_ref[:].astype(jnp.float32)
    acc = acc_ref[:]
    for i in range(8):
        codes = ((words >> (4 * i)) & 15).astype(jnp.bfloat16)  # (bn, g)
        xt_i = xt_ref[pl.ds(i * g, g), :].astype(jnp.bfloat16)  # (g, bm)
        dot = jax.lax.dot_general(
            codes, xt_i, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bn, bm)
        xsum = jnp.sum(xt_i.astype(jnp.float32), axis=0, keepdims=True)  # (1, bm)
        gi = k * 8 + i
        col = jax.lax.broadcasted_iota(jnp.int32, s_all.shape, 1) == gi
        s_i = jnp.sum(jnp.where(col, s_all, 0.0), axis=1, keepdims=True)
        zs_i = jnp.sum(jnp.where(col, zs_all, 0.0), axis=1, keepdims=True)
        acc += dot * s_i - zs_i * xsum
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def tdot(xt, qwt, st, zt, block_n=1024):
    # xt: (c_pad, bm); qwt: (r, c_pad//8); st/zt: (r, n_groups)
    c_pad, b = xt.shape
    r = qwt.shape[0]
    g = G
    bk = 8 * g
    n_k = c_pad // bk
    zs = (zt.astype(jnp.float32) * st.astype(jnp.float32)).astype(st.dtype)
    return pl.pallas_call(
        functools.partial(_k_tdot, g=g, n_k=n_k),
        grid=(1, r // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bk, b), lambda i, j, k: (k, i)),
            pl.BlockSpec((block_n, g), lambda i, j, k: (j, k)),
            pl.BlockSpec((block_n, st.shape[1]), lambda i, j, k: (j, 0)),
            pl.BlockSpec((block_n, st.shape[1]), lambda i, j, k: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, b), lambda i, j, k: (j, i)),
        out_shape=jax.ShapeDtypeStruct((r, b), xt.dtype),
        scratch_shapes=[pltpu.VMEM((block_n, b), jnp.float32)],
    )(xt, qwt, st, zs)


def main():
    keys = jax.random.split(jax.random.key(0), N)
    parts = [make_parts(k) for k in keys]
    x = jnp.full((B, D), 0.01, jnp.bfloat16) + jnp.arange(D, dtype=jnp.bfloat16)[None] * 1e-5

    # correctness cross-check on one op
    qw, s, z = parts[0]
    p = PackedLinear(qweight=qw, scales=s, zeros=z, perm=None,
                     group_size=G, in_features=D)
    ref = w4a16_matmul(x, p)
    got_b = bigdot(x, qw, s, z)
    qwt = qw.T.copy()
    st = s.T.copy()
    zt = z.T.copy()
    got_t = tdot(x.T.copy(), qwt, st, zt).T
    for name, got in (("bigdot", got_b), ("tdot", got_t)):
        d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        rel = d.max() / np.abs(np.asarray(ref, np.float32)).max()
        print(f"  {name} max-rel-err vs prod: {rel:.4f}", file=sys.stderr)

    bts = N * (qw.nbytes + s.nbytes + z.nbytes)
    flops = N * 2 * B * D * D

    def rep(name, t):
        print(f"  {name:10s} {t*1e3:8.3f} ms  {bts/t/1e9:6.1f} GB/s  "
              f"{flops/t/1e12:6.1f} TF/s", file=sys.stderr)

    # prod chain
    ps = [PackedLinear(qweight=a, scales=b_, zeros=c, perm=None,
                       group_size=G, in_features=D) for a, b_, c in parts]
    f = jax.jit(lambda x, ps: [x := w4a16_matmul(x, p) for p in ps][-1])
    rep("prod", best_window(f, (x, ps)))

    # bigdot chain
    f = jax.jit(lambda x, parts: [
        x := bigdot(x, a, b_, c) for a, b_, c in parts][-1])
    rep("bigdot", best_window(f, (x, parts)))

    # tdot chain (transposed throughout: out (r, bm) feeds next xt)
    tparts = [(a.T.copy(), b_.T.copy(), c.T.copy()) for a, b_, c in parts]
    xt = x.T.copy()
    f = jax.jit(lambda xt, tparts: [
        xt := tdot(xt, a, b_, c) for a, b_, c in tparts][-1])
    rep("tdot", best_window(f, (xt, tparts)))

    # dense roof
    ws = [jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02 for k in keys]
    f = jax.jit(lambda x, ws: [x := jnp.dot(
        x, w, preferred_element_type=jnp.bfloat16) for w in ws][-1])
    t = best_window(f, (x, ws))
    print(f"  dense      {t*1e3:8.3f} ms  {N*ws[0].nbytes/t/1e9:6.1f} GB/s  "
          f"{flops/t/1e12:6.1f} TF/s", file=sys.stderr)


if __name__ == "__main__":
    main()
