"""Long-context paged-KV decode A/B: int8 vs int4 pages at b32 x 1024
(round-5, verdict item 2: "turn int4 KV from a capacity tier into a
bandwidth tier at long context").

The util config's contiguous int4 path deliberately reads int8-equivalent
traffic twice (two-pass XLA unpack), so int4 never bought BYTES there.
The paged ragged kernel's in-kernel nibble unpack reads half the bytes —
this measures whether that byte win survives its unpack compute at the
long-context shape, via the same fori multi-step methodology as bench.py.

Usage: python scripts/bench_paged_longctx.py [batch] [ctx]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")

from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import (calibrate_kv_scales,
                                       fuse_stage_linears,
                                       random_packed_llama)

ROUNDS, STEPS = 5, 32
PAGE = 64


def measure_contig(model, cfg, batch, max_seq, prefix, kv_bits, scales):
    cache = kvc.init_contiguous_cache(
        cfg.num_hidden_layers, batch, max_seq, cfg.num_key_value_heads,
        cfg.head_dim_, dtype=jnp.int8,
        k_scales=scales[0], v_scales=scales[1],
        kv_bits=4 if kv_bits == 4 else None)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)), jnp.int32)
    temps = jnp.zeros((batch,), jnp.float32)
    key = jax.random.key(0)
    pos = prefix
    t0 = time.time()
    out, cache, key = D.decode_sample_loop(
        model, tokens, cache, None, jnp.full((batch,), pos, jnp.int32),
        temps, key, STEPS)
    np.asarray(out)
    pos += STEPS
    print(f"  b={batch} s={max_seq} contig kv{kv_bits} compile+warmup "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(ROUNDS):
        if pos + STEPS >= max_seq:
            pos = prefix
        t0 = time.time()
        out, cache, key = D.decode_sample_loop(
            model, tokens, cache, None, jnp.full((batch,), pos, jnp.int32),
            temps, key, STEPS)
        np.asarray(out)
        pos += STEPS
        best = min(best, (time.time() - t0) / STEPS)
    del cache, out
    return batch / best


def measure(model, cfg, batch, max_seq, prefix, kv_bits, scales):
    pages_per_seq = max_seq // PAGE
    n_pages = 1 + batch * pages_per_seq
    cache = kvc.init_cache(
        cfg.num_hidden_layers, n_pages, PAGE, cfg.num_key_value_heads,
        cfg.head_dim_, dtype=jnp.int8,
        k_scales=scales[0], v_scales=scales[1],
        kv_bits=4 if kv_bits == 4 else None)
    bt = jnp.asarray(
        1 + np.arange(batch * pages_per_seq).reshape(batch, pages_per_seq),
        jnp.int32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)), jnp.int32)
    temps = jnp.zeros((batch,), jnp.float32)
    key = jax.random.key(0)
    pos = prefix
    t0 = time.time()
    out, cache, key = D.decode_sample_loop(
        model, tokens, cache, bt, jnp.full((batch,), pos, jnp.int32),
        temps, key, STEPS)
    np.asarray(out)
    pos += STEPS
    print(f"  b={batch} s={max_seq} paged kv{kv_bits} compile+warmup "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(ROUNDS):
        if pos + STEPS >= max_seq:
            pos = prefix
        t0 = time.time()
        out, cache, key = D.decode_sample_loop(
            model, tokens, cache, bt, jnp.full((batch,), pos, jnp.int32),
            temps, key, STEPS)
        np.asarray(out)
        pos += STEPS
        best = min(best, (time.time() - t0) / STEPS)
    del cache, out
    return batch / best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    max_seq = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    prefix = max_seq - STEPS * 3 - 8
    if len(sys.argv) > 3 and sys.argv[3] == "llama3":
        # Llama-3-8B shapes: GQA (8 kv heads, group 4) — the paged
        # kernel's q-blocks per kv head are MXU-viable here, unlike MHA
        cfg = LlamaConfig(vocab_size=128256, intermediate_size=14336,
                          num_key_value_heads=8, rope_theta=500000.0,
                          dtype="bfloat16")
    else:
        cfg = LlamaConfig(dtype="bfloat16")  # Llama-2-7B
    t0 = time.time()
    model = jax.device_put(fuse_stage_linears(
        random_packed_llama(cfg, group_size=128, seed=0,
                            compute_dtype=cfg.jdtype)))
    print(f"setup {time.time() - t0:.1f}s", file=sys.stderr)
    s8 = calibrate_kv_scales(model, bits=8)
    s4 = calibrate_kv_scales(model, bits=4)

    kv_bytes = lambda bits: (cfg.num_hidden_layers * 2 * batch * max_seq
                             * cfg.num_key_value_heads * cfg.head_dim_
                             * bits // 8)
    results = {}
    for bits, scales in ((8, s8), (4, s4)):
        tok_s = measure(model, cfg, batch, max_seq, prefix, bits, scales)
        results["paged", bits] = tok_s
        print(f"  paged kv{bits}: {tok_s:.1f} tok/s  "
              f"kv_stream={kv_bytes(bits) * tok_s / batch / 1e9:.0f} GB/s",
              file=sys.stderr)
        tok_s = measure_contig(model, cfg, batch, max_seq, prefix, bits,
                               scales)
        results["contig", bits] = tok_s
        print(f"  contig kv{bits}: {tok_s:.1f} tok/s", file=sys.stderr)
    best8 = max(results["paged", 8], results["contig", 8])
    best4 = max(results["paged", 4], results["contig", 4])
    print(f"b{batch} x {max_seq}: "
          f"paged int4 {results['paged', 4]:.1f} / contig int4 "
          f"{results['contig', 4]:.1f} vs paged int8 "
          f"{results['paged', 8]:.1f} / contig int8 "
          f"{results['contig', 8]:.1f} tok/s | best int4/int8 ratio "
          f"{best4 / best8:.2f}x")


if __name__ == "__main__":
    main()
