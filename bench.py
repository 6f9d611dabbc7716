"""Headline benchmark: W4A16 decode tokens/s/chip, Llama-2-7B shapes.

Prints ONE JSON line:
``{"metric": ..., "value": tok/s, "unit": "tok/s", "vs_baseline": ...}``

``vs_baseline`` is measured tokens/s over the north-star target of **80% of
the HBM-bandwidth roofline** for this chip (BASELINE.json: "W4A16 decode
>=80% of HBM-bandwidth roofline per chip") — >=1.0 meets the target.  The
reference itself has no serving path at all (it evaluates on dequantized
fp16 linears, reference ``quant.py:262-279``), so the roofline is the only
honest baseline for this metric.

Roofline model: a decode step must move the packed INT4 weights + scales +
lm_head once and the batch's paged KV once; tokens/s_roofline =
batch / (bytes_per_step / HBM_BW).
"""
import json
import sys
import time

import numpy as np

import jax

from gptq_v2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from gptq_v2_tpu.models.llama import LlamaConfig
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import random_packed_llama

# Peak HBM bandwidth (bytes/s) per chip generation.
HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5": 2765e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}

BATCH = 64
PAGE_SIZE = 16
MAX_SEQ = 256
PREFIX = 128
WARMUP = 3
STEPS = 20


def main():
    for batch in (BATCH, BATCH // 2, BATCH // 4):
        try:
            return run(batch)
        except Exception as e:  # HBM pressure from co-tenants: back off batch
            oomish = any(s in str(e) for s in
                         ("RESOURCE_EXHAUSTED", "Out of memory",
                          "out of memory", "OOM", "ResourceExhausted"))
            if not oomish or batch == BATCH // 4:
                raise
            print(f"batch {batch} OOM'd; retrying at {batch // 2}",
                  file=sys.stderr)


def run(batch):
    on_tpu = jax.default_backend() == "tpu"
    dev = jax.devices()[0]
    if on_tpu:
        cfg = LlamaConfig(dtype="bfloat16")  # Llama-2-7B
    else:  # CPU smoke run (Pallas interpret mode): scaled down
        cfg = LlamaConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=704, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          dtype="float32")
    t0 = time.time()
    model = random_packed_llama(cfg, group_size=128 if on_tpu else 32, seed=0,
                                compute_dtype=cfg.jdtype)
    model = jax.device_put(model)

    cache = kvc.init_contiguous_cache(cfg.num_hidden_layers, batch, MAX_SEQ,
                                      cfg.num_key_value_heads, cfg.head_dim_,
                                      dtype=cfg.jdtype)
    block_tables = None
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)), jnp.int32)
    print(f"setup {time.time() - t0:.1f}s", file=sys.stderr)

    # ---- measured decode ---------------------------------------------------
    # NB: completion is forced with a host readback of the last logits —
    # block_until_ready is not reliable on the tunneled (axon) TPU platform,
    # and the steps chain through the donated cache, so the readback of step
    # N's output transitively waits for all N steps.
    pos = PREFIX
    t0 = time.time()
    for i in range(WARMUP):
        logits, cache = D.decode_step(model, tokens, cache, block_tables,
                                      jnp.full((batch,), pos + i, jnp.int32))
    np.asarray(logits[:, :8])
    print(f"compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    pos += WARMUP
    t0 = time.time()
    for i in range(STEPS):
        logits, cache = D.decode_step(model, tokens, cache, block_tables,
                                      jnp.full((batch,), pos + i, jnp.int32))
    np.asarray(logits[:, :8])
    dt = time.time() - t0
    tok_s = batch * STEPS / dt

    # ---- roofline ----------------------------------------------------------
    def leaf_bytes(tree):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree))

    weight_bytes = (sum(leaf_bytes(lp) for lp in model.layers)
                    + model.lm_head.nbytes + model.norm.nbytes)
    itemsize = jnp.dtype(cfg.jdtype).itemsize
    kv_read = (cfg.num_hidden_layers * 2 * batch * MAX_SEQ
               * cfg.num_key_value_heads * cfg.head_dim_ * itemsize)
    bytes_per_step = weight_bytes + kv_read
    bw = HBM_BW.get(dev.device_kind, 819e9)
    roofline_tok_s = batch / (bytes_per_step / bw)
    target = 0.8 * roofline_tok_s
    util = tok_s / roofline_tok_s

    print(
        f"device={dev.device_kind} bytes/step={bytes_per_step / 1e9:.2f}GB "
        f"bw={bw / 1e9:.0f}GB/s roofline={roofline_tok_s:.0f}tok/s "
        f"measured={tok_s:.1f}tok/s util={util:.1%}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "w4a16_decode_llama2_7b_tok_s_per_chip",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / target, 4),
    }))


if __name__ == "__main__":
    main()
