"""Host-side anatomy of a steady-state quantization block.

Monkeypatch-times the pipeline's phase functions (Hessian accumulate,
invert, solver, packing, forwards) to find where the non-device ~68% of
per-block wall time goes.
"""
import collections
import functools
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.models.llama import init_params
from gptq_v2_tpu import pipeline as PL
from gptq_v2_tpu.quant import gptq as GQ
from gptq_v2_tpu.quant import hessian as HS

N_LAYERS = 2
N_SEQ, SEQLEN, BS = 128, 2048, 16

acc = collections.Counter()
cnt = collections.Counter()


def timed(mod, name):
    fn = getattr(mod, name)

    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[:1] or [0])
        acc[name] += time.time() - t0
        cnt[name] += 1
        return out

    setattr(mod, name, wrap)


timed(HS, "accumulate")
timed(HS, "invert")
timed(GQ, "gptq_quant")


def run_once():
    cfg = L.LlamaConfig(num_hidden_layers=N_LAYERS, dtype="bfloat16")
    params = init_params(cfg, jax.random.key(0))
    enc = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (N_SEQ, SEQLEN)).astype(np.int32)
    t0 = time.time()
    PL.quantize_model(cfg, params, enc, PL.QuantConfig(), batch_size=BS)
    return time.time() - t0


if __name__ == "__main__":
    t1 = run_once()
    print(f"cold: {t1:.1f} s", file=sys.stderr, flush=True)
    acc.clear(); cnt.clear()
    t2 = run_once()
    print(f"warm: {t2:.1f} s ({t2 / N_LAYERS:.2f} s/block)", file=sys.stderr,
          flush=True)
    tracked = sum(acc.values())
    for name, s in acc.most_common():
        print(f"  {name:14s} {s:7.2f} s x{cnt[name]}", file=sys.stderr,
              flush=True)
    print(f"  tracked {tracked:.2f} s; untracked (forwards, packing, python)"
          f" {t2 - tracked:.2f} s", file=sys.stderr, flush=True)
