"""MXU compute ceiling probe (round-5, verdict item: replace the
unsupported "MXU-bound" claim about the b320 capacity config with a
measured same-epoch ceiling, analogous to ``bench_hbm.py`` for HBM).

Measures sustained bf16 TFLOP/s over chained big GEMMs, best-of-N:

* ``gemm``    — one square (N, N) @ (N, N) per dispatch (pure MXU, weights
  resident in VMEM-friendly tiles; XLA pipelines HBM loads behind compute)
* ``chain``   — eight dependent GEMMs in one jit (removes dispatch tax and
  lets XLA keep the MXU saturated across op boundaries)
* ``batched`` — (8, M, M) batch matmul (the shape class of per-layer decode
  GEMMs at large batch)

Prints a table and ``mxu_ceiling`` = best sustained TFLOP/s.  ``bench.py``
imports :func:`probe_mxu_ceiling` for the capacity-config decomposition.
v5e spec is ~197 bf16 TFLOP/s; co-tenant silicon probes lower — the probe,
not the spec, is the defensible roofline (the same argument as the HBM
probe, whose 538 GB/s vs 819 spec anchored the round-4 verdict analysis).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time_best_flops(fn, args, flops, reps=4, rounds=6):
    """Best sustained FLOP/s over `rounds` windows of `reps` calls."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1, :1]), out)  # warm
    best = 0.0
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1, :1]), out)
        dt = time.time() - t0
        best = max(best, reps * flops / dt)
    return best


def probe_methods(n: int = 4096):
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    gemm = jax.jit(lambda a, b: a @ b)
    yield "gemm", _time_best_flops(gemm, (a, b), 2 * n**3)

    def chain(a, b, k):
        x = a
        for _ in range(k):
            # renormalize cheaply so the chain doesn't overflow bf16
            x = (x @ b) * jnp.bfloat16(1.0 / n)
        return x

    yield "chain8", _time_best_flops(
        jax.jit(lambda a, b: chain(a, b, 8)), (a, b), 8 * 2 * n**3)
    yield "chain32", _time_best_flops(
        jax.jit(lambda a, b: chain(a, b, 32)), (a, b), 32 * 2 * n**3,
        reps=2)

    m = n // 2
    ab = jnp.ones((8, m, m), jnp.bfloat16)
    bb = jnp.ones((8, m, m), jnp.bfloat16)
    bat = jax.jit(lambda a, b: jnp.einsum("bij,bjk->bik", a, b))
    yield "batched", _time_best_flops(bat, (ab, bb), 8 * 2 * m**3)

    n2 = 2 * n
    a2 = jnp.ones((n2, n2), jnp.bfloat16)
    b2 = jnp.ones((n2, n2), jnp.bfloat16)
    yield "chain8@2N", _time_best_flops(
        jax.jit(lambda a, b: chain(a, b, 8) * jnp.bfloat16(n / n2)),
        (a2, b2), 8 * 2 * n2**3, reps=2)


def probe_mxu_ceiling(verbose=True, n: int = 4096) -> float:
    """Best sustained bf16 TFLOP/s across methods (same-epoch ceiling)."""
    best, best_name = 0.0, ""
    for name, fl in probe_methods(n):
        if verbose:
            print(f"  {name:8s} @ N={n}: {fl / 1e12:7.1f} TFLOP/s",
                  file=sys.stderr)
        if fl > best:
            best, best_name = fl, name
    if verbose:
        print(f"mxu ceiling {best / 1e12:.1f} TFLOP/s ({best_name})",
              file=sys.stderr)
    return best


if __name__ == "__main__":
    t0 = time.time()
    ceiling = probe_mxu_ceiling()
    print(f"MXU bf16 ceiling: {ceiling / 1e12:.1f} TFLOP/s "
          f"(probe {time.time() - t0:.1f}s; v5e spec ~197)")
