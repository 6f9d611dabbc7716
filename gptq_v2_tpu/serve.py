"""Serving CLI: load a checkpoint + quantization results, run the W4A16
continuous-batching engine, report decode throughput.

The inference entry point the reference lacks entirely (its pipeline ends
at perplexity evaluation on dequantized fp16 linears, reference
``quant.py:262-279``).

Run: ``python -m gptq_v2_tpu.serve --model-dir ... --results outputs/results.npz
[--tp N | --pp N] [--benchmark true]``
"""
from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gptq_v2_tpu.flags import str2bool

logger = logging.getLogger(__name__)


def parse_serve_args(argv=None):
    p = argparse.ArgumentParser(description="gptq-v2 TPU W4A16 serving")
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--results", type=str, default="./outputs/results.npz",
                   help="quantization results from gptq_v2_tpu.main")
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--cache-kind", type=str, default="contiguous",
                   choices=["contiguous", "paged"])
    p.add_argument("--kv-dtype", type=str, default="native",
                   choices=["native", "int8"],
                   help="int8 halves decode KV traffic (per-layer scales "
                        "auto-calibrated at engine build)")
    p.add_argument("--scheduler", type=str, default="phased",
                   choices=["phased", "ragged"],
                   help="ragged = vLLM-style chunked prefill, one mixed "
                        "dispatch per tick (paged cache only)")
    p.add_argument("--token-budget", type=int, default=0,
                   help="ragged tick token budget (0 = auto)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel ways over a device mesh (0 = off)")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel stages (layer pipelining over a "
                        "'stage' mesh; contiguous cache only; 0 = off)")
    p.add_argument("--benchmark", type=str2bool, default=True,
                   help="run a synthetic decode-throughput benchmark")
    p.add_argument("--bench-tokens", type=int, default=64,
                   help="new tokens per request in the benchmark")
    p.add_argument("--prompt-tokens", type=int, default=64)
    return p.parse_args(argv)


def build_engine(args):
    from gptq_v2_tpu.main import load_results
    from gptq_v2_tpu.models.loader import load_hf_model
    from gptq_v2_tpu.serving import Engine
    from gptq_v2_tpu.serving.model import quantize_params_to_packed

    cfg, params = load_hf_model(args.model_dir)
    results = load_results(args.results)
    model = quantize_params_to_packed(cfg, params, results["data"],
                                      compute_dtype=jnp.bfloat16)
    mesh = None
    if args.tp and args.pp:
        raise SystemExit("--tp and --pp are mutually exclusive (TPxPP "
                         "composition not implemented)")
    if args.tp:
        from gptq_v2_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp, dp=1)
    elif args.pp:
        from gptq_v2_tpu.parallel import make_pp_mesh

        mesh = make_pp_mesh(args.pp)
    return Engine(model, max_batch=args.max_batch, page_size=args.page_size,
                  max_seq_len=args.max_seq_len, cache_kind=args.cache_kind,
                  mesh=mesh, kv_dtype=args.kv_dtype,
                  scheduler=args.scheduler,
                  token_budget=args.token_budget or None)


def main(argv=None) -> dict:
    logging.basicConfig(format="%(levelname)s %(asctime)s %(message)s",
                        level=logging.INFO)
    logging.info(" ".join(argv if argv is not None else sys.argv))
    from gptq_v2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_serve_args(argv)
    eng = build_engine(args)
    stats = {}
    if args.benchmark:
        from gptq_v2_tpu.serving import Request

        rng = np.random.default_rng(0)
        vocab = eng.model.cfg.vocab_size
        reqs = [Request(uid=i,
                        prompt=rng.integers(0, vocab, (args.prompt_tokens,)).tolist(),
                        max_new_tokens=args.bench_tokens)
                for i in range(args.max_batch)]
        # warmup: one full-length request so every prefill bucket and every
        # decode context bucket the timed run will cross is compiled here
        eng.run([Request(uid=-1, prompt=reqs[0].prompt[:],
                         max_new_tokens=args.bench_tokens)])
        t0 = time.time()
        eng.run(reqs)
        dt = time.time() - t0
        total = args.max_batch * args.bench_tokens
        stats = {"requests": args.max_batch, "new_tokens": total,
                 "wall_s": round(dt, 2), "tok_s": round(total / dt, 1)}
        logging.info("benchmark: %s", stats)
    return stats


if __name__ == "__main__":
    main()
