"""int4-KV decode A/B at Llama-2-7B shapes on the real chip.

Compares sustained decode tok/s for:
* int8 KV, contiguous einsum path (production default) at B=128
* int4 packed KV, contiguous-attention Pallas kernel path at B=128
* int4 packed KV at B=256 (the capacity the halved cache frees up)

Methodology matches bench.py (best-of-N sustained windows, one sync per
8-step round).
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
from gptq_v2_tpu.serving.model import calibrate_kv_scales, random_packed_llama

MAX_SEQ, PREFIX, ROUNDS, STEPS = 256, 128, 5, 8


def measure(model, cfg, batch, kv_bits, scales):
    cache = kvc.init_contiguous_cache(
        cfg.num_hidden_layers, batch, MAX_SEQ, cfg.num_key_value_heads,
        cfg.head_dim_, dtype=jnp.int8,
        k_scales=scales[0], v_scales=scales[1],
        kv_bits=4 if kv_bits == 4 else None)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)), jnp.int32)
    pos = PREFIX
    t0 = time.time()
    logits, cache = D.decode_step(model, tokens, cache, None,
                                  jnp.full((batch,), pos, jnp.int32))
    np.asarray(logits[:, :8])
    pos += 1
    print(f"  b={batch} kv_bits={kv_bits} compile {time.time() - t0:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(ROUNDS):
        if pos + STEPS >= MAX_SEQ:
            pos = PREFIX
        t0 = time.time()
        for _ in range(STEPS):
            logits, cache = D.decode_step(
                model, tokens, cache, None,
                jnp.full((batch,), pos, jnp.int32))
            pos += 1
        np.asarray(logits[:, :8])
        best = min(best, (time.time() - t0) / STEPS)
    kv_read = (cfg.num_hidden_layers * 2 * batch * MAX_SEQ
               * cfg.num_key_value_heads * cfg.head_dim_ * kv_bits // 8)
    del cache, logits
    return batch / best, kv_read


def main():
    cfg = LlamaConfig(dtype="bfloat16")
    model = jax.device_put(random_packed_llama(
        cfg, group_size=128, seed=0, compute_dtype=cfg.jdtype))
    s8 = calibrate_kv_scales(model, bits=8)
    s4 = calibrate_kv_scales(model, bits=4)
    for batch, bits, scales in ((128, 8, s8), (128, 4, s4), (256, 4, s4)):
        try:
            tok_s, kv_read = measure(model, cfg, batch, bits, scales)
            print(f"  b={batch} kv_bits={bits}: {tok_s:7.1f} tok/s   "
                  f"kv={kv_read / 1e9:.1f}GB/step", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"  b={batch} kv_bits={bits}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
