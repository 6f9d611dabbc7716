"""Steady-state quantization block anatomy: device time vs wall time.

Runs a 2-block 7B-width quantization twice (first run pays the compiles),
traces the second, and reports device-op totals by category vs wall —
the host-gap fraction is the optimization target for per-block wall time.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # the CLI's policy: compile once per host

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.pipeline import QuantConfig, quantize_model
from gptq_v2_tpu.models.llama import init_params

N_LAYERS = 2
N_SEQ, SEQLEN, BS = 128, 2048, 16


def run_once():
    cfg = L.LlamaConfig(num_hidden_layers=N_LAYERS, dtype="bfloat16")
    params = init_params(cfg, jax.random.key(0))
    enc = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (N_SEQ, SEQLEN)).astype(np.int32)
    t0 = time.time()
    quantize_model(cfg, params, enc, QuantConfig(), batch_size=BS)
    return time.time() - t0


if __name__ == "__main__":
    t1 = run_once()
    print(f"cold run ({N_LAYERS} blocks): {t1:.1f} s", file=sys.stderr,
          flush=True)
    with jax.profiler.trace("/tmp/quantblock"):
        t2 = run_once()
    print(f"warm run ({N_LAYERS} blocks): {t2:.1f} s "
          f"({t2 / N_LAYERS:.2f} s/block)", file=sys.stderr, flush=True)

    import collections
    import glob
    import gzip
    import json

    fpath = sorted(glob.glob(
        "/tmp/quantblock/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(fpath) as fh:
        tr = json.load(fh)
    names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    tot = collections.Counter()
    cnt = collections.Counter()
    span = [float("inf"), 0.0]
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and names.get((e["pid"], e["tid"])) == "XLA Ops":
            key = e["name"].split(".")[0]
            tot[key] += e["dur"]
            cnt[key] += 1
            span[0] = min(span[0], e["ts"])
            span[1] = max(span[1], e["ts"] + e["dur"])
    dev_total = sum(tot.values()) / 1e6
    print(f"device busy {dev_total:.2f} s of {t2:.2f} s wall "
          f"({dev_total / t2:.0%}); device span {(span[1]-span[0])/1e6:.2f} s",
          file=sys.stderr, flush=True)
    for name, us in tot.most_common(12):
        print(f"  {name[:52]:52s} {us/1e6:8.3f} s x{cnt[name]}",
              file=sys.stderr, flush=True)
