"""Tile-parameter sweep for the paged decode kernel at the LONG-CONTEXT
shape (b32 x 1024, Llama-2-7B MHA heads) — round-5 item 2 diagnosis.

bench_paged_tuning.py's round-3 sweep (whole-sequence KV blocks +
16-query blocks) was run at s=256; at s=1024 the paged kernel streams
only 177 GB/s (int8) vs the contiguous einsum's 471, so the override is
re-swept here per (kv_bits, num_kv_pages_per_block, num_queries_per_block).

Usage: python scripts/bench_paged_tiles_longctx.py
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from gptq_v2_tpu.ops.paged_attention import paged_decode_attention

B, CTX, PAGE, NKV, HD, HQ = 32, 1024, 64, 32, 128, 32
PPS = CTX // PAGE  # pages per sequence


def run(kv_bits, nkpb, nqpb, reps=64):
    rng = np.random.default_rng(0)
    comb = NKV if kv_bits == 4 else 2 * NKV
    n_pages = 1 + B * PPS
    kv = jnp.asarray(rng.integers(-100, 100, (n_pages, PAGE, comb, HD)),
                     jnp.int8)
    bt = jnp.asarray(1 + np.arange(B * PPS).reshape(B, PPS), jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, HD)), jnp.bfloat16)
    lens = jnp.full((B,), CTX - 8, jnp.int32)

    fn = jax.jit(lambda q, kv, lens, bt: paged_decode_attention(
        q, kv, lens, bt,
        k_scale=0.01, v_scale=0.01,
        kv_int4=kv_bits == 4,
        num_kv_pages_per_block=nkpb,
        num_queries_per_block=nqpb,
        vmem_limit_bytes=100 * 1024 * 1024))
    out = fn(q, kv, lens, bt)
    np.asarray(out[:1, :1])
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        for _ in range(reps):
            out = fn(q, kv, lens, bt)
        np.asarray(out[:1, :1])
        best = min(best, (time.time() - t0) / reps)
    bytes_read = B * CTX * NKV * HD * 2 * kv_bits // 8
    return best * 1e6, bytes_read / best / 1e9


def main():
    for kv_bits in (8, 4):
        print(f"kv_bits={kv_bits}", file=sys.stderr)
        for nkpb in (None, 4, 8, 16):
            for nqpb in (None, 1, 4, 8, 16, 32):
                try:
                    us, gbs = run(kv_bits, nkpb, nqpb)
                    print(f"  nkpb={str(nkpb):5s} nqpb={str(nqpb):5s}: "
                          f"{us:8.1f} us  {gbs:6.1f} GB/s", file=sys.stderr)
                except Exception as e:
                    print(f"  nkpb={nkpb} nqpb={nqpb}: FAIL "
                          f"{str(e)[:80]}", file=sys.stderr)


if __name__ == "__main__":
    main()
