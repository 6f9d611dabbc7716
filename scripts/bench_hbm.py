"""Defensible HBM bandwidth probe.

Round-1's probe was a single ``jnp.sum`` reduce of one 2 GB buffer and
measured 246 GB/s — *below* the 344 GB/s the decode step itself observed,
so it could not serve as a ceiling argument.  This probe fixes that by
measuring several independent streaming methods at several footprints and
taking best-of-N over time:

* ``reduce``   — ``sum(x.astype(f32))`` (the old probe; VPU-bound lower bound)
* ``matvec``   — ``X @ v`` with X (rows, 512) bf16: 2 flop/byte, the same
  weight-streaming pattern as W4A16 decode, MXU-fed so never compute-bound
* ``matvec8``  — eight parallel matvecs over separate buffers in one jit
  (multiple HBM streams in flight, XLA can overlap)
* ``copy``     — ``y = x + 1`` (counts read+write bytes)

Prints a table and a final ``ceiling`` = max sustained bytes/s across all
methods.  ``bench.py`` imports :func:`probe_ceiling` for its roofline note.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time_best(fn, args, nbytes, reps=8, rounds=6):
    """Best sustained bytes/s over `rounds` timed windows of `reps` calls."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)  # warm
    best = 0.0
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
        dt = time.time() - t0
        best = max(best, reps * nbytes / dt)
    return best


def probe_methods(footprint_bytes: int):
    """Yield (name, best_bytes_per_sec) for each method at one footprint.

    Each method allocates and frees its own buffers so peak live HBM stays
    ~= one footprint (+ the copy method's output).
    """
    n = footprint_bytes // 2  # bf16 elements
    cols = 512
    rows = n // cols
    v = jnp.ones((cols, 1), jnp.bfloat16)

    x = jnp.ones((rows, cols), jnp.bfloat16)
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))[None])
    yield "reduce", _time_best(red, (x,), x.nbytes)

    # thin matmul: (rows, 512) @ (512, 128) — the decode weight-streaming
    # pattern; 128-wide output keeps the MXU fed, traffic ~= the big matrix
    vm = jnp.ones((cols, 128), jnp.bfloat16)
    mm = jax.jit(lambda x, v: jnp.dot(x, v,
                                      preferred_element_type=jnp.bfloat16))
    yield "thinmm", _time_best(mm, (x, vm), x.nbytes)
    del x

    # copy doubles live bytes (in + out): run it at half footprint
    y = jnp.ones((rows // 2, cols), jnp.bfloat16)
    cp = jax.jit(lambda x: x + jnp.bfloat16(1))
    yield "copy", _time_best(cp, (y,), 2 * y.nbytes)
    del y


def probe_ceiling(footprints=(2 << 30, 4 << 30, 6 << 30), verbose=True):
    """Max sustained HBM bytes/s across methods x footprints (best-of-N)."""
    best = 0.0
    best_desc = ""
    for fp in footprints:
        for name, bw in probe_methods(fp):
            if verbose:
                print(f"  {name:8s} @ {fp >> 30}GiB: {bw / 1e9:7.1f} GB/s",
                      file=sys.stderr)
            if bw > best:
                best, best_desc = bw, f"{name}@{fp >> 30}GiB"
    if verbose:
        print(f"ceiling {best / 1e9:.1f} GB/s ({best_desc})", file=sys.stderr)
    return best


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    bw = probe_ceiling()
    print(f"{bw / 1e9:.1f}")
