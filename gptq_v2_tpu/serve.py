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
import os
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
                   choices=["native", "int8", "int4"],
                   help="int8 halves decode KV traffic (per-layer scales "
                        "auto-calibrated at engine build); int4 halves it "
                        "again (nibble-packed, contiguous cache only)")
    p.add_argument("--scheduler", type=str, default="phased",
                   choices=["phased", "ragged"],
                   help="ragged = vLLM-style chunked prefill, one mixed "
                        "dispatch per tick (paged cache only)")
    p.add_argument("--token-budget", type=int, default=0,
                   help="ragged tick token budget (0 = auto)")
    p.add_argument("--prefix-cache", type=str2bool, default=False,
                   help="shared-prefix KV page reuse (paged cache + "
                        "ragged scheduler)")
    p.add_argument("--mla-absorbed", type=str2bool, default=False,
                   help="DeepSeek MLA: decode over the compressed latent "
                        "cache (one kv_lora+rope row per token)")
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
    p.add_argument("--draft-dir", type=str, default="",
                   help="draft model checkpoint dir: enables speculative "
                        "decoding (small-batch latency mode; contiguous "
                        "cache, single chip)")
    p.add_argument("--draft-results", type=str, default="",
                   help="optional quantization results for the draft "
                        "(default: serve the draft in bf16)")
    p.add_argument("--spec-k", type=int, default=4,
                   help="speculative proposal length")
    p.add_argument("--spec-mode", type=str, default="generate",
                   choices=["generate", "engine"],
                   help="generate = fixed-batch speculative_generate loop; "
                        "engine = speculation inside the continuous-"
                        "batching engine (per-request admission/EOS)")
    p.add_argument("--profile-dir", type=str, default="",
                   help="capture a jax.profiler trace of the timed "
                        "benchmark run (TensorBoard/Perfetto)")
    p.add_argument("--multi-step", type=int, default=1,
                   help="k fused decode+sample steps per host sync "
                        "(composes with TP/PP meshes, the ragged "
                        "scheduler, and MLA-absorbed decode)")
    p.add_argument("--act-dtype", type=str, default="native",
                   choices=("native", "int8"),
                   help="int8 = the W4A8 tier: per-row dynamic int8 "
                        "activations into int8 MXU dots (single-device)")
    # multi-host entry (jax.distributed): one process per host
    p.add_argument("--coordinator", type=str, default="",
                   help="host:port of process 0's coordinator service")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--state-path", type=str, default="",
                   help="crash-recovery snapshot file: unfinished requests"
                        " are written every few ticks and resumed on"
                        " startup (scripts/serve_supervised.py)")
    return p.parse_args(argv)


def _load_packed(model_dir: str, results_path: str):
    from gptq_v2_tpu.main import load_results
    from gptq_v2_tpu.models.loader import load_hf_model
    from gptq_v2_tpu.serving.model import quantize_params_to_packed

    cfg, params = load_hf_model(model_dir)
    data = load_results(results_path)["data"] if results_path else {}
    return quantize_params_to_packed(cfg, params, data,
                                     compute_dtype=jnp.bfloat16)


def build_engine(args):
    from gptq_v2_tpu.serving import Engine

    model = _load_packed(args.model_dir, args.results)
    mesh = None
    if args.pp:  # PP, optionally composed with TP on ('stage','model')
        from gptq_v2_tpu.parallel import make_pp_mesh

        mesh = make_pp_mesh(args.pp, tp=args.tp or 1)
    elif args.tp:
        from gptq_v2_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp, dp=1)
    return Engine(model, max_batch=args.max_batch, page_size=args.page_size,
                  max_seq_len=args.max_seq_len, cache_kind=args.cache_kind,
                  mesh=mesh, kv_dtype=args.kv_dtype,
                  scheduler=args.scheduler,
                  token_budget=args.token_budget or None,
                  prefix_cache=args.prefix_cache,
                  mla_absorbed=args.mla_absorbed,
                  multi_step=args.multi_step,
                  act_dtype=args.act_dtype)


def main(argv=None) -> dict:
    logging.basicConfig(format="%(levelname)s %(asctime)s %(message)s",
                        level=logging.INFO)
    logging.info(" ".join(argv if argv is not None else sys.argv))
    from gptq_v2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_serve_args(argv)
    if args.num_processes > 1:  # multi-host: join the cluster before any
        from gptq_v2_tpu.parallel.mesh import init_distributed  # device use

        init_distributed(args.coordinator or None, args.num_processes,
                         args.process_id)
    if args.draft_dir:
        return _speculative_main(args)
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
        from gptq_v2_tpu.utils import profile_trace

        prefixes = {}
        if args.state_path and os.path.exists(args.state_path):
            # crashed mid-run: resume accepted work (continuation prompts
            # reconstruct the lost KV cache; greedy completes identically)
            import json as _json

            from gptq_v2_tpu.serving.engine import restore_requests

            with open(args.state_path) as f:
                snap = _json.load(f)
            reqs, prefixes = restore_requests(snap)
            logging.info("resuming %d unfinished requests from %s",
                         len(reqs), args.state_path)
        t0 = time.time()
        with profile_trace(args.profile_dir):
            out = eng.run(reqs, snapshot_path=args.state_path or None)
        for uid, pre in prefixes.items():
            if uid in out:
                out[uid] = pre + out[uid]
        dt = time.time() - t0
        total = args.max_batch * args.bench_tokens
        stats = {"requests": args.max_batch, "new_tokens": total,
                 "wall_s": round(dt, 2), "tok_s": round(total / dt, 1)}
        if args.prefix_cache:
            stats["prefix_hit_tokens"] = eng.prefix_hit_tokens
        logging.info("benchmark: %s", stats)
    return stats


def _speculative_main(args) -> dict:
    """Speculative-decoding benchmark: target + draft, greedy, small batch."""
    from gptq_v2_tpu.serving.speculative import speculative_generate

    target = _load_packed(args.model_dir, args.results)
    draft = _load_packed(args.draft_dir, args.draft_results)
    if args.kv_dtype == "int4":
        raise SystemExit("--kv-dtype int4 does not compose with "
                         "speculative decoding (use int8)")
    kv = jnp.int8 if args.kv_dtype == "int8" else None
    mesh = None
    if args.tp:  # TP-sharded target, single-device draft
        from gptq_v2_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp, dp=1)
    rng = np.random.default_rng(0)
    vocab = target.cfg.vocab_size
    b = min(args.max_batch, 8)  # speculation targets small-batch latency
    prompts = [rng.integers(0, vocab, (args.prompt_tokens,)).tolist()
               for _ in range(b)]
    if args.spec_mode == "engine":
        return _speculative_engine_bench(args, target, draft, prompts, mesh)
    # warmup compiles every step shape
    speculative_generate(target, draft, prompts, max_new_tokens=2,
                         k=args.spec_k, kv_dtype=kv,
                         max_seq_len=args.max_seq_len, mesh=mesh)
    from gptq_v2_tpu.utils import profile_trace

    t0 = time.time()
    with profile_trace(args.profile_dir):
        _, st = speculative_generate(target, draft, prompts,
                                     max_new_tokens=args.bench_tokens,
                                     k=args.spec_k, kv_dtype=kv,
                                     max_seq_len=args.max_seq_len, mesh=mesh)
    dt = time.time() - t0
    stats = {"requests": b, "new_tokens": b * args.bench_tokens,
             "wall_s": round(dt, 2),
             "tok_s": round(b * args.bench_tokens / dt, 1),
             "accept_rate": round(st.accept_rate, 3),
             "tokens_per_round": round(st.tokens_per_round, 2)}
    logging.info("speculative benchmark: %s", stats)
    return stats


def _speculative_engine_bench(args, target, draft, prompts, mesh) -> dict:
    """Speculation inside the continuous-batching engine (Engine(draft=))."""
    from gptq_v2_tpu.serving import Engine, Request

    def mk_engine():
        # --scheduler ragged composes speculation with chunked prefill +
        # the paged cache (+ --prefix-cache); default stays phased
        kw = {}
        if args.scheduler == "ragged":
            kw = dict(cache_kind="paged", scheduler="ragged",
                      page_size=args.page_size,
                      token_budget=args.token_budget or None,
                      prefix_cache=args.prefix_cache)
        return Engine(target, max_batch=len(prompts),
                      max_seq_len=args.max_seq_len, kv_dtype=args.kv_dtype,
                      draft=draft, spec_k=args.spec_k, mesh=mesh, **kw)

    def reqs():
        return [Request(uid=i, prompt=p, max_new_tokens=args.bench_tokens)
                for i, p in enumerate(prompts)]

    mk_engine().run(reqs())  # warmup: compiles every step shape
    from gptq_v2_tpu.utils import profile_trace

    eng = mk_engine()
    t0 = time.time()
    with profile_trace(args.profile_dir):
        eng.run(reqs())
    dt = time.time() - t0
    total = len(prompts) * args.bench_tokens
    stats = {"requests": len(prompts), "new_tokens": total,
             "wall_s": round(dt, 2), "tok_s": round(total / dt, 1),
             "accept_rate": round(
                 eng.spec_accepted / max(eng.spec_proposed, 1), 3),
             "ticks": eng.steps}
    logging.info("speculative engine benchmark: %s", stats)
    return stats


if __name__ == "__main__":
    main()
