"""Same-process A/B of streaming patterns (co-tenancy-safe comparisons)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul

D = 4096
N = 12


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


def report(name, t, nbytes, flops=0):
    print(f"  {name:34s} {t*1e3:8.3f} ms  {nbytes/t/1e9:6.1f} GB/s"
          + (f"  {flops/t/1e12:6.1f} TF/s" if flops else ""), file=sys.stderr)


def main():
    b = 128
    keys = jax.random.split(jax.random.key(0), 4 * N)

    # reduce probe (2GiB)
    big = jnp.ones((2 << 30 >> 10, 512), jnp.bfloat16)  # 2 GiB
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))[None])
    t = best_window(red, (big,))
    report("reduce 2GiB", t, big.nbytes)
    del big

    # dense chained (x = x @ w)
    ws = [jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02 for k in keys[:N]]
    x = jnp.full((b, D), 0.01, jnp.bfloat16)
    f_chain = jax.jit(lambda x, ws: [x := jnp.dot(
        x, w, preferred_element_type=jnp.bfloat16) for w in ws][-1])
    t = best_window(f_chain, (x, ws))
    report(f"dense chain x{N}", t, sum(w.nbytes for w in ws),
           2 * b * D * D * N)

    # dense independent (sum of x @ w_i)
    f_ind = jax.jit(lambda x, ws: sum(jnp.dot(
        x, w, preferred_element_type=jnp.bfloat16) for w in ws))
    t = best_window(f_ind, (x, ws))
    report(f"dense indep x{N}", t, sum(w.nbytes for w in ws),
           2 * b * D * D * N)
    del ws

    # packed chained
    ps = [make_packed(k, D, D) for k in keys[N:2 * N]]

    def pchain(x, ps):
        for p in ps:
            x = w4a16_matmul(x, p)
        return x

    f_p = jax.jit(pchain)
    t = best_window(f_p, (x, ps))
    pb = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes for p in ps)
    report(f"w4a16 chain x{N}", t, pb, 2 * b * D * D * N)

    # packed big shape (4096 -> 11008)
    ps2 = [make_packed(k, D, 11008) for k in keys[2 * N:3 * N]]

    def pbig(x, ps2):
        y = None
        for p in ps2:
            o = w4a16_matmul(x, p)
            y = o if y is None else y + o
        return y

    f_p2 = jax.jit(pbig)
    t = best_window(f_p2, (x, ps2))
    pb2 = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes for p in ps2)
    report(f"w4a16 chain 4096->11008 x{N}", t, pb2, 2 * b * D * 11008 * N)

    # reduce again (same-epoch sanity)
    big = jnp.ones((2 << 30 >> 10, 512), jnp.bfloat16)
    t = best_window(red, (big,))
    report("reduce 2GiB (again)", t, big.nbytes)


if __name__ == "__main__":
    main()
