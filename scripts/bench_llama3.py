"""Llama-3-8B-shaped decode sweep (GQA, 128k vocab) — bench.py's
methodology (fori multi-step, best-of-N) at the Llama-3 capacity/util
configs.  The 128256-vocab lm_head is ~1 GB in bf16 (a ~7 ms/step
thin-matmul read); the round-5 int8 head applies here too.

Usage: python scripts/bench_llama3.py [b1 b2 ...]
"""
import dataclasses
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.ops.packing import rtn_pack_dense
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import (calibrate_kv_scales,
                                       fuse_stage_linears,
                                       random_packed_llama)

MAX_SEQ, PREFIX, ROUNDS, K = 256, 128, 5, 32


def measure(model, cfg, batch, kv_bits, scales):
    cache = kvc.init_contiguous_cache(
        cfg.num_hidden_layers, batch, MAX_SEQ, cfg.num_key_value_heads,
        cfg.head_dim_, dtype=jnp.int8, k_scales=scales[0],
        v_scales=scales[1], kv_bits=4 if kv_bits == 4 else None)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)), jnp.int32)
    temps = jnp.zeros((batch,), jnp.float32)
    key = jax.random.key(0)
    pos = PREFIX
    t0 = time.time()
    out, cache, key = D.decode_sample_loop(
        model, tokens, cache, None, jnp.full((batch,), pos, jnp.int32),
        temps, key, K)
    np.asarray(out)
    pos += K
    print(f"  b={batch} kv{kv_bits} compile+warmup {time.time() - t0:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(ROUNDS):
        if pos + K >= MAX_SEQ:
            pos = PREFIX
        t0 = time.time()
        out, cache, key = D.decode_sample_loop(
            model, tokens, cache, None, jnp.full((batch,), pos, jnp.int32),
            temps, key, K)
        np.asarray(out)
        pos += K
        best = min(best, (time.time() - t0) / K)
    del cache, out
    return batch / best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [512, 384]
    cfg = LlamaConfig(vocab_size=128256, intermediate_size=14336,
                      num_key_value_heads=8, rope_theta=500000.0,
                      dtype="bfloat16")
    t0 = time.time()
    model = fuse_stage_linears(
        random_packed_llama(cfg, group_size=128, seed=0,
                            compute_dtype=cfg.jdtype))
    lm8 = jax.tree_util.tree_map(jnp.asarray, rtn_pack_dense(
        np.asarray(model.lm_head, np.float32), 128,
        compute_dtype=cfg.jdtype, bits=8))
    model = jax.device_put(dataclasses.replace(model, lm_head=lm8))
    print(f"setup {time.time() - t0:.1f}s", file=sys.stderr)
    s4 = calibrate_kv_scales(model, bits=4)
    s8 = calibrate_kv_scales(model, bits=8)
    for b in batches:
        bits = 4 if b >= 512 else 8
        tok_s = measure(model, cfg, b, bits, s4 if bits == 4 else s8)
        print(f"llama3-8b b{b} kv{bits}: {tok_s:.1f} tok/s")


if __name__ == "__main__":
    main()
