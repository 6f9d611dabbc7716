"""Sweep ragged-paged-attention kernel tile sizes on the real chip.

The kernel (vLLM-TPU production ragged_paged_attention) exposes
``num_kv_pages_per_block`` / ``num_queries_per_block``; its built-in
auto-tune table is keyed on TPU generation + model shape and may be far
from optimal for this host (tunneled v5e at ~40% of spec bandwidth) and
for decode-dominated ticks.  This sweep times an L-layer chained
attention step (device-true: all layers inside one jit, serialized by
folding each layer's output back into q) per (pages-block, queries-block)
config and prints a table.

Usage:  python scripts/bench_paged_tuning.py [--layers 8] [--ctx 2048]
"""
import argparse
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from gptq_v2_tpu.ops.paged_attention import paged_decode_attention
from gptq_v2_tpu.serving import kv_cache as kvc


def build(batch, ctx, n_layers, n_kv, hq, hd, page_size, kv_dtype, seed=0):
    n_pages = 1 + batch * (ctx // page_size)  # page 0 = trash
    # generate on-device (host gen + tunnel transfer would take many
    # minutes); int8 is drawn directly — eager bf16->f32->int8 conversion
    # chains peak at ~4x the cache size and OOM 16 GB HBM
    shape = (n_layers, n_pages, page_size, 2 * n_kv, hd)
    if kv_dtype == "int8":
        kv = jax.jit(lambda k: jax.random.randint(
            k, shape, -127, 128, jnp.int8))(jax.random.key(seed))
        k_scales = tuple(1 / 40.0 for _ in range(n_layers))
        v_scales = k_scales
    else:
        kv = jax.random.normal(jax.random.key(seed), shape, jnp.bfloat16)
        k_scales = v_scales = None
    cache = kvc.PagedKVCache(kv, page_size, k_scales, v_scales)
    bt = jnp.asarray(
        1 + np.arange(batch * (ctx // page_size)).reshape(batch, -1),
        jnp.int32)
    q = jax.random.normal(jax.random.key(seed + 1), (batch, hq, hd),
                          jnp.bfloat16)
    lengths = jnp.full((batch,), ctx, jnp.int32)
    return q, cache, lengths, bt


def step_fn(n_layers, kvpb, qpb, k_scales, v_scales):
    def f(q, kv, lengths, bt):
        out = q
        for li in range(n_layers):
            a = paged_decode_attention(
                out.astype(jnp.bfloat16), kv[li], lengths, bt,
                k_scale=k_scales[li] if k_scales else None,
                v_scale=v_scales[li] if v_scales else None,
                num_kv_pages_per_block=kvpb,
                num_queries_per_block=qpb,
                vmem_limit_bytes=100 * 1024 * 1024,
            )
            out = out + a  # serialize layers
        return out
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--q-heads", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    hd = 128
    q, cache, lengths, bt = build(args.batch, args.ctx, args.layers,
                                  args.kv_heads, args.q_heads, hd,
                                  args.page_size, args.kv_dtype)
    kv_bytes = args.layers * args.batch * args.ctx * 2 * args.kv_heads * hd \
        * (1 if args.kv_dtype == "int8" else 2)
    print(f"KV bytes/step {kv_bytes / 1e9:.2f} GB  "
          f"({args.layers}L x B{args.batch} x ctx{args.ctx} "
          f"x {args.kv_heads}kv x {args.kv_dtype})")

    pages_per_seq = args.ctx // args.page_size
    kvp_opts = sorted({x for x in (4, 16, 64, pages_per_seq)
                       if x <= pages_per_seq})
    qb_opts = [None, 16, 64]
    results = []
    for kvpb, qpb in itertools.product([None] + kvp_opts, qb_opts):
        f = jax.jit(step_fn(args.layers, kvpb, qpb,
                            cache.k_scales, cache.v_scales))
        try:
            out = f(q, cache.kv, lengths, bt)
            np.asarray(out.ravel()[:1])  # force (block_until_ready unreliable)
            t0 = time.time()
            for _ in range(args.reps):
                out = f(q, cache.kv, lengths, bt)
            np.asarray(out.ravel()[:1])
            dt = (time.time() - t0) / args.reps
        except Exception as e:
            print(f"kvpb={kvpb} qpb={qpb}: FAIL {str(e)[:200]}")
            continue
        bw = kv_bytes / dt / 1e9
        results.append((dt, kvpb, qpb))
        print(f"kvpb={str(kvpb):>4} qpb={str(qpb):>4}: {dt * 1e3:7.2f} ms  "
              f"{bw:6.0f} GB/s")
    results.sort()
    print("\nbest:", [(f"{d * 1e3:.2f}ms", k, p) for d, k, p in results[:5]])


if __name__ == "__main__":
    main()
