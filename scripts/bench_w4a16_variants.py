"""W4A16 kernel experiments: MXU roof + batch sweep + dot-layout variants.

Measures, each as a chained multi-op single-dispatch program:
* XLA bf16 dense matmul at the same shapes (the practical MXU roof)
* the production w4a16 kernel at several batches
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul

D, I = 4096, 11008
N_LAYERS = 8  # chain length (distinct weights -> real HBM streams)


def best_window(fn, args, reps=6, rounds=4):
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


def bench_dense(b):
    keys = jax.random.split(jax.random.key(0), N_LAYERS * 4)
    ws = [jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02
          for k in keys[:N_LAYERS * 2]]

    def chain(x, ws):
        for w in ws:
            x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        return x

    f = jax.jit(chain)
    x = jnp.full((b, D), 0.01, jnp.bfloat16)
    t = best_window(f, (x, ws))
    n = len(ws)
    flops = 2 * b * D * D * n
    bts = sum(w.nbytes for w in ws)
    print(f"  dense bf16 ({b},{D})@({D},{D}) x{n}: {t/n*1e3:7.3f} ms/op "
          f"{flops/t/1e12:6.1f} TFLOP/s  {bts/t/1e9:6.1f} GB/s",
          file=sys.stderr)


def bench_packed(b, shapes=((D, D),)):
    keys = jax.random.split(jax.random.key(1), N_LAYERS * len(shapes))
    ps = [make_packed(k, c, r)
          for k, (c, r) in zip(keys, [s for s in shapes for _ in range(N_LAYERS)])]

    def chain(x, ps):
        y = None
        for p in ps:
            o = w4a16_matmul(x[:, :p.in_features], p)
            y = o if y is None else y + o[:, :y.shape[1]]
        return y

    # all same (c, r) per run for chainability: keep shapes uniform
    f = jax.jit(chain)
    c = shapes[0][0]
    x = jnp.full((b, c), 0.01, jnp.bfloat16)
    t = best_window(f, (x, ps))
    n = len(ps)
    flops = sum(2 * b * p.in_features_padded * p.out_features for p in ps)
    bts = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes for p in ps)
    print(f"  w4a16 ({b},{shapes[0][0]})->({shapes[0][1]}) x{n}: "
          f"{t/n*1e3:7.3f} ms/op  {flops/t/1e12:6.1f} TFLOP/s  "
          f"{bts/t/1e9:6.1f} GB/s", file=sys.stderr)


if __name__ == "__main__":
    import sys as _s
    which = _s.argv[1] if len(_s.argv) > 1 else "all"
    if which in ("dense", "all"):
        for b in (128, 32):
            bench_dense(b)
    if which in ("packed", "all"):
        for b in (128, 32):
            bench_packed(b)
