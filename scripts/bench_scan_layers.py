"""Measure scan-over-layers vs unrolled decode: compile time + step time.

On this environment XLA compiles remotely on a single core (2-10 min for
a 32-layer unrolled 7B decode program, no cross-process cache), so folding
the layer loop into one ``lax.scan`` body — 32x fewer kernel instances —
could slash serving cold starts.  The risk (per earlier measurements of
scan-over-*steps*): XLA double-buffers big scan carries/outputs; if the
per-layer KV cache ys can't alias the donated input buffer, every step
pays a full cache copy.  This script measures both variants at 7B decode
shapes and prints compile + steady-state times.

Usage: python scripts/bench_scan_layers.py [--layers 32] [--batch 64]

MEASURED RESULT (v5e, 2026-08-17, 32-layer 7B, B=64, ctx=256 bf16 cache):
the scan variant is NOT viable — XLA materializes an extra full-cache
double buffer for the scanned KV xs/ys ("program 8.31G" scratch on top of
the 11.7G arguments; output DOES alias the donated input), blowing the
15.75 GB HBM budget that the unrolled program fits with room to spare.
The unrolled decode step compiled in 12.3 s in this process (the axon
terminal's server-side compile cache hits on program hash across
processes more often than earlier measurements suggested) and ran
28.1 ms/step.  Conclusion: keep the unrolled layer loop; revisit only if
XLA learns to alias scan xs->ys through donation.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.ops.packing import PackedLinear
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import _lin, random_packed_llama


def stack_layers(layers):
    """Per-name stacking of the per-layer param dicts onto a leading L axis.
    PackedLinear fields stack; the static metadata must match."""
    names = layers[0].keys()
    out = {}
    for n in names:
        vals = [lp[n] for lp in layers]
        if isinstance(vals[0], PackedLinear):
            out[n] = PackedLinear(
                qweight=jnp.stack([v.qweight for v in vals]),
                scales=jnp.stack([v.scales for v in vals]),
                zeros=jnp.stack([v.zeros for v in vals]),
                perm=(None if vals[0].perm is None
                      else jnp.stack([v.perm for v in vals])),
                group_size=vals[0].group_size,
                in_features=vals[0].in_features,
                bits=vals[0].bits,
            )
        else:
            out[n] = jnp.stack(vals)
    return out


def build_scan_step(model):
    cfg = model.cfg

    def step(stacked, embed_w, norm_w, lm_head, tokens, ck, cv, positions):
        b = tokens.shape[0]
        s = ck.shape[2]
        cos, sin = L.rope_cos_sin(cfg, positions)
        cos, sin = cos[:, None, :], sin[:, None, :]
        x = L.embed_lookup(cfg, embed_w, tokens)[:, None, :]
        key_mask = jnp.arange(s)[None, :] <= positions[:, None]

        def body(x, per_layer):
            # scan slices pytree leaves per layer; PackedLinear aux rides
            lp, ck_l, cv_l = per_layer

            def attn_fn(q, k, v):
                nonlocal ck_l, cv_l
                rows = jnp.arange(b)[:, None]
                ck_l = ck_l.at[rows, positions[:, None]].set(
                    k.astype(ck_l.dtype))
                cv_l = cv_l.at[rows, positions[:, None]].set(
                    v.astype(cv_l.dtype))
                attn = L.attention(q, ck_l[:, :s], cv_l[:, :s],
                                   causal_offset=None, key_mask=key_mask)
                return attn, None

            x, _ = L.block_core(cfg, lp, x, cos, sin,
                                lambda n_, h: _lin(lp, n_, h), attn_fn)
            return x, (ck_l, cv_l)

        x, (ck2, cv2) = jax.lax.scan(body, x, (stacked, ck, cv))
        x = L.rms_norm(x, norm_w, cfg.rms_norm_eps)
        return x[:, 0] @ lm_head, ck2, cv2

    return jax.jit(step, donate_argnums=(5, 6))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    cfg = L.LlamaConfig(num_hidden_layers=args.layers,
                        dtype="bfloat16")  # Llama-2-7B shapes
    model = jax.device_put(random_packed_llama(cfg, seed=0))
    b, s = args.batch, args.ctx
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    pos0 = s // 2

    def timed(tag, fn, *fargs):
        t0 = time.time()
        out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        compile_s = time.time() - t0
        print(f"{tag}: compile+first {compile_s:.1f}s", flush=True)
        return out, compile_s

    # ---- unrolled (production decode_step) -------------------------------
    cache = kvc.init_contiguous_cache(args.layers, b, s,
                                      cfg.num_key_value_heads, cfg.head_dim_,
                                      dtype=jnp.bfloat16)
    t0 = time.time()
    logits, cache = D.decode_step(model, tokens, cache, None,
                                  jnp.full((b,), pos0, jnp.int32))
    np.asarray(logits[:, :4])
    print(f"unrolled: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(args.reps):
        logits, cache = D.decode_step(model, tokens, cache, None,
                                      jnp.full((b,), pos0 + 1 + i, jnp.int32))
    np.asarray(logits[:, :4])
    un_dt = (time.time() - t0) / args.reps
    print(f"unrolled: steady {un_dt * 1e3:.1f} ms/step", flush=True)
    del cache

    # ---- scan-over-layers ------------------------------------------------
    stacked = stack_layers(list(model.layers))
    shape = (args.layers, b, s, cfg.num_key_value_heads, cfg.head_dim_)
    ck = jnp.zeros(shape, jnp.bfloat16)
    cv = jnp.zeros(shape, jnp.bfloat16)
    step = build_scan_step(model)
    t0 = time.time()
    logits, ck, cv = step(stacked, model.embed_tokens, model.norm,
                          model.lm_head, tokens, ck, cv,
                          jnp.full((b,), pos0, jnp.int32))
    np.asarray(logits[:, :4])
    print(f"scan: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(args.reps):
        logits, ck, cv = step(stacked, model.embed_tokens, model.norm,
                              model.lm_head, tokens, ck, cv,
                              jnp.full((b,), pos0 + 1 + i, jnp.int32))
    np.asarray(logits[:, :4])
    sc_dt = (time.time() - t0) / args.reps
    print(f"scan: steady {sc_dt * 1e3:.1f} ms/step "
          f"({sc_dt / un_dt:.2f}x unrolled)", flush=True)


if __name__ == "__main__":
    main()
