"""Layer-streamed perplexity evaluation.

Semantics mirror the reference evaluator (reference: ``llama.py:207-247``):

* hidden states for *all* eval windows stay resident (here: on the TPU),
  decoder layers stream through one at a time (host → device), double
  buffering via functional updates,
* ppl = ``exp(mean(shifted cross-entropy))`` where the per-batch mean NLL is
  weighted by batch size (the reference appends the batch-mean once per
  sequence, ``llama.py:242-243``),
* eval windows are non-overlapping ``seqlen`` strides (enforced upstream by
  the data loaders, reference ``data_utils.py:57``).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.pipeline import (_to_device, _block_fwd_for, _device_layer,
                                  _stack_batches)


@functools.partial(jax.jit, static_argnames=("eps", "unit_offset"))
def _final_norm(w, xb, eps, unit_offset=False):
    return L.rms_norm(xb, w, eps, unit_offset)


@functools.partial(jax.jit, static_argnames=("logit_cap",))
def _batch_nll(lm_head, hidden, labels, logit_cap=None):
    """Mean shifted cross-entropy over one batch, fp32."""
    logits = L.soft_cap(hidden @ lm_head, logit_cap)
    logits = logits[:, :-1, :].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = labels[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def evaluate_ppl(
    cfg: L.LlamaConfig,
    params: L.Params,
    encodings: np.ndarray,  # (n_seq, seqlen)
    batch_size: int = 8,
) -> float:
    n_seq, seqlen = encodings.shape
    positions = jnp.arange(seqlen)
    ropes = L.rope_tables(cfg, positions)

    embed_w = _to_device(params["embed_tokens"])
    embed_fn = jax.jit(lambda w, t: L.embed_lookup(cfg, w, t))
    # stacked chunks (one scan dispatch per layer — pipeline host-tax fix)
    xs = _stack_batches(
        [embed_fn(embed_w, jnp.asarray(encodings[b:b + batch_size]))
         for b in range(0, n_seq, batch_size)])
    del embed_w

    for li in range(cfg.num_hidden_layers):
        block_fwd = _block_fwd_for(cfg, window=cfg.layer_window(li),
                                   qk_l2=cfg.layer_qk_l2(li))
        cos_sin = ropes[cfg.layer_rope(li)]  # Gemma-3 local/global rope
        lp = _device_layer(params["layers"][li])
        xs = [block_fwd(lp, xc, cos_sin) for xc in xs]
        del lp
    x = jnp.concatenate([xc.reshape(-1, *xc.shape[2:]) for xc in xs], axis=0)
    del xs

    norm_w = _to_device(params["norm"])
    x = jnp.concatenate(
        [_final_norm(norm_w, x[b:b + batch_size], cfg.rms_norm_eps,
                     cfg.norm_unit_offset)
         for b in range(0, n_seq, batch_size)], axis=0)

    lm_head = _to_device(params["lm_head"])
    total, weight = 0.0, 0
    for b in range(0, n_seq, batch_size):
        labels = jnp.asarray(encodings[b:b + batch_size])
        nll = _batch_nll(lm_head, x[b:b + batch_size], labels,
                         logit_cap=cfg.final_logit_softcap)
        bs = labels.shape[0]
        total += float(nll) * bs
        weight += bs
    return float(np.exp(total / weight))
