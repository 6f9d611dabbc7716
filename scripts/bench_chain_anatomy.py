"""Isolate per-op fixed cost vs marginal streaming cost (same process)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul

D = 4096
B = 128


def best_window(fn, args, reps=8, rounds=4):
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


def make_packed(key, c, r, g=128, with_perm=False):
    c_pad = -(-c // (8 * g)) * (8 * g)
    n_g = c_pad // g
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qweight = jax.lax.bitcast_convert_type(
        jax.random.bits(k1, (c_pad // 8, r), jnp.uint32), jnp.int32)
    scales = ((jax.random.uniform(k2, (n_g, r), jnp.float32) + 0.5)
              * (0.2 / np.sqrt(c))).astype(jnp.bfloat16)
    zeros = jax.random.randint(k3, (n_g, r), 0, 16).astype(jnp.bfloat16)
    perm = (jax.random.permutation(k4, c).astype(jnp.int32)
            if with_perm else None)
    return PackedLinear(qweight=qweight, scales=scales, zeros=zeros,
                        perm=perm, group_size=g, in_features=c)


def main():
    keys = jax.random.split(jax.random.key(0), 64)
    x = jnp.full((B, D), 0.01, jnp.bfloat16)

    # chain length sweep: strict dependency
    for n in (1, 2, 4, 8, 16):
        ps = [make_packed(k, D, D) for k in keys[:n]]
        f = jax.jit(lambda x, ps: [x := w4a16_matmul(x, p) for p in ps][-1])
        t = best_window(f, (x, ps))
        print(f"  strict chain n={n:2d}: {t*1e3:8.3f} ms total "
              f"({t/n*1e3:6.3f} ms/op)", file=sys.stderr)

    # fan-out: n independent ops from one x, summed
    for n in (4, 16):
        ps = [make_packed(k, D, D) for k in keys[:n]]
        f = jax.jit(lambda x, ps: sum(w4a16_matmul(x, p) for p in ps))
        t = best_window(f, (x, ps))
        print(f"  fan-out       n={n:2d}: {t*1e3:8.3f} ms total "
              f"({t/n*1e3:6.3f} ms/op)", file=sys.stderr)

    # mimic the model layer: qkv fan-out -> o -> gate/up -> down, x4 layers
    layers = []
    ki = iter(keys[32:])
    for _ in range(4):
        layers.append(dict(
            q=make_packed(next(ki), D, D), k=make_packed(next(ki), D, D),
            v=make_packed(next(ki), D, D), o=make_packed(next(ki), D, D),
            g=make_packed(next(ki), D, 11008), u=make_packed(next(ki), D, 11008),
            d=make_packed(next(ki), 11008, D)))

    def model_like(x, layers):
        for lp in layers:
            h = (w4a16_matmul(x, lp["q"]) + w4a16_matmul(x, lp["k"])
                 + w4a16_matmul(x, lp["v"]))
            h = w4a16_matmul(h, lp["o"])
            g = w4a16_matmul(h, lp["g"])
            u = w4a16_matmul(h, lp["u"])
            x = w4a16_matmul(g * u, lp["d"]) + h
        return x

    f = jax.jit(model_like)
    t = best_window(f, (x, layers))
    bts = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes
              for lp in layers for p in lp.values())
    print(f"  model-like 4 layers (28 ops): {t*1e3:8.3f} ms "
          f"({t/28*1e3:6.3f} ms/op, {bts/t/1e9:6.1f} GB/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
