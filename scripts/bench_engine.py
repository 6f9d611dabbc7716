"""Engine aggregate tok/s vs the raw decode step (verdict item: the
engine must land within 1.5x of the raw step on the same host).

Measures, at 7B shapes with the production config (int8 KV, contiguous):
* the raw decode step at batch B (one dispatch per step)
* the full continuous-batching engine (prefill + scheduling + sampling)
  at multi_step k in {1, 8}

Prints one JSON line with all three and the engine/raw ratios.
"""
import argparse
import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import Engine, Request
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import calibrate_kv_scales, random_packed_llama


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument("--multi-step", type=int, default=8)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig(dtype="bfloat16")
    else:
        cfg = LlamaConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=704, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          dtype="float32")
        args.batch, args.prompt, args.new = 4, 8, 16
    model = jax.device_put(random_packed_llama(
        cfg, group_size=128 if on_tpu else 32, seed=0,
        compute_dtype=cfg.jdtype))
    kv_dtype = "int8" if on_tpu else "native"
    b = args.batch

    # ---- raw step --------------------------------------------------------
    k_scales, v_scales = calibrate_kv_scales(model)
    cache = kvc.init_contiguous_cache(
        cfg.num_hidden_layers, b, args.max_seq, cfg.num_key_value_heads,
        cfg.head_dim_, dtype=jnp.int8 if on_tpu else cfg.jdtype,
        k_scales=k_scales if on_tpu else None,
        v_scales=v_scales if on_tpu else None)
    tokens = jnp.zeros((b,), jnp.int32)
    pos = jnp.full((b,), args.prompt, jnp.int32)
    logits, cache = D.decode_step(model, tokens, cache, None, pos)
    np.asarray(logits[:, :4])
    t0 = time.time()
    for i in range(12):
        logits, cache = D.decode_step(model, tokens, cache, None, pos + i)
    np.asarray(logits[:, :4])
    raw_tok_s = b * 12 / (time.time() - t0)
    del cache, logits
    print(f"raw step: {raw_tok_s:.1f} tok/s", file=sys.stderr)

    # ---- engine ----------------------------------------------------------
    def engine_run(k):
        eng = Engine(model, max_batch=b, max_seq_len=args.max_seq,
                     kv_dtype=kv_dtype, multi_step=k,
                     kv_scales=(k_scales, v_scales) if on_tpu else None)
        rng = np.random.default_rng(0)
        reqs = [Request(uid=i,
                        prompt=rng.integers(0, cfg.vocab_size,
                                            (args.prompt,)).tolist(),
                        max_new_tokens=args.new) for i in range(b)]
        # warm the compile caches with one request
        eng.run([Request(uid=-1, prompt=reqs[0].prompt[:],
                         max_new_tokens=args.new)])
        eng2 = Engine(model, max_batch=b, max_seq_len=args.max_seq,
                      kv_dtype=kv_dtype, multi_step=k,
                      kv_scales=(k_scales, v_scales) if on_tpu else None)
        t0 = time.time()
        eng2.run(reqs)
        dt = time.time() - t0
        tok_s = b * args.new / dt
        print(f"engine multi_step={k}: {tok_s:.1f} tok/s aggregate "
              f"({dt:.1f}s)", file=sys.stderr)
        return tok_s

    e1 = engine_run(1)
    ek = engine_run(args.multi_step)
    print(json.dumps({
        "metric": "engine_vs_raw_step",
        "raw_step_tok_s": round(raw_tok_s, 1),
        "engine_tok_s_multistep1": round(e1, 1),
        f"engine_tok_s_multistep{args.multi_step}": round(ek, 1),
        "engine_over_raw": round(ek / raw_tok_s, 4),
        "raw_over_engine": round(raw_tok_s / ek, 4),
    }))


if __name__ == "__main__":
    main()
