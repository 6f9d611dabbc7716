"""Kernel microbenchmarks: Pallas vs jnp-twin throughput at production shapes.

The counterpart of the reference's kernel harnesses
(``gptq_triton/accumulate_hessian.py:206-248`` TFLOPS sweeps,
``package/tests/benchmark.py`` 3-way timing).  Prints one line per
(kernel, shape): achieved TFLOPS / GB/s and the twin's time.

Completion is forced with 1-element host readbacks (block_until_ready is
unreliable on tunneled TPU runtimes).

Run on TPU: ``python scripts/bench_kernels.py [--quick]``
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp


def _sync(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(f, *args, n=10):
    y = f(*args)
    _sync(y)
    t0 = time.time()
    for _ in range(n):
        y = f(*args)
    _sync(y)
    return (time.time() - t0) / n


def bench_hessian(quick=False):
    from gptq_v2_tpu.ops.hessian_pallas import accumulate_hessian
    from gptq_v2_tpu.quant.hessian import HessianState, accumulate

    shapes = [(32768, 4096)] + ([] if quick else [(32768, 11008)])
    for t, d in shapes:
        x = jax.random.normal(jax.random.key(0), (t, d), jnp.bfloat16)
        h = jnp.zeros((d, d), jnp.float32)
        dt_k = timeit(jax.jit(lambda h, x: accumulate_hessian(h, x)), h, x)
        dt_j = timeit(jax.jit(
            lambda h, x: accumulate(HessianState(h, jnp.int32(0)), x,
                                    use_kernel=False).hessian), h, x)
        flops = t * d * d  # symmetric: half of 2*t*d^2
        print(f"hessian T={t} D={d}: pallas {dt_k*1e3:.1f} ms "
              f"({flops/dt_k/1e12:.1f} TFLOPS eff.) | jnp-twin {dt_j*1e3:.1f} ms")


def bench_w4a16(quick=False):
    from gptq_v2_tpu.models.llama import LlamaConfig
    from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
    from gptq_v2_tpu.ops.packing import dequantize_dense
    from gptq_v2_tpu.serving.model import random_packed_llama

    n_layers = 4 if quick else 16
    cfg = LlamaConfig(dtype="bfloat16", num_hidden_layers=n_layers)
    model = random_packed_llama(cfg, group_size=128, seed=0,
                                compute_dtype=jnp.bfloat16, act_order=False)
    ps = [model.layers[i]["mlp.gate_proj"] for i in range(n_layers)]
    x = jnp.ones((8, 4096), jnp.bfloat16)
    by = sum(p.qweight.nbytes + p.scales.nbytes + p.zeros.nbytes for p in ps)

    @jax.jit
    def many(x, ps):  # weights as args, not closure constants
        acc = 0.0
        for p in ps:
            acc = acc + w4a16_matmul(x, p).sum()
        return acc

    dt = timeit(many, x, ps)
    print(f"w4a16 {n_layers}x (8,4096)@(4096,11008) int4: {dt*1e3:.1f} ms "
          f"-> {by/dt/1e9:.0f} GB/s packed-weight stream")
    wd = dequantize_dense(ps[0], jnp.bfloat16)
    wds = [wd] * n_layers

    @jax.jit
    def dense(x, wds):
        acc = 0.0
        for w in wds:
            acc = acc + (x @ w).sum()
        return acc

    dtd = timeit(dense, x, wds)
    print(f"  bf16 dense same GEMMs: {dtd*1e3:.1f} ms "
          f"(int4 moves {wds[0].nbytes/ (ps[0].qweight.nbytes+ps[0].scales.nbytes+ps[0].zeros.nbytes):.1f}x less HBM)")


def bench_solver(quick=False):
    from gptq_v2_tpu.ops.gptq_pallas import gptq_solve

    shapes = [(4096, 4096)] + ([] if quick else [(4096, 11008), (11008, 4096)])
    for c, r in shapes:
        hinv = jnp.eye(c, dtype=jnp.float32) * 0.95
        w = jax.random.normal(jax.random.key(1), (c, r), jnp.float32) * 0.02
        dt = timeit(jax.jit(
            lambda w, h: gptq_solve(w, h, 128, 15.0)["qweight"]), w, hinv, n=3)
        print(f"gptq solver R={r} C={c} g=128: {dt*1e3:.0f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    bench_hessian(args.quick)
    bench_w4a16(args.quick)
    bench_solver(args.quick)
