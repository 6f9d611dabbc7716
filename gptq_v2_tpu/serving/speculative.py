"""Draft-model speculative decoding over the contiguous KV cache.

Small-batch decode latency is dispatch- and weight-streaming-bound: every
emitted token costs one full read of the target's INT4 weights.  A small
draft model proposes ``k`` tokens autoregressively; the target then scores
all ``k + 1`` positions in ONE chunked forward (`verify_chunk`) and the
standard accept/reject rule (Leviathan et al. 2023 / Chen et al. 2023 —
accept draft token ``i`` with probability ``min(1, p_t(d_i)/p_d(d_i))``,
resample the first rejection from ``norm(max(0, p_t - p_d))``) emits
between 1 and ``k + 1`` tokens per target read.  Greedy (temperature 0)
acceptance degenerates to prefix-matching target argmax, so greedy output
is **token-identical** to plain greedy decoding of the target.

TPU-first structure — every step is a fixed-shape jitted program:

* draft proposal: a 2-token `verify_chunk` catch-up (rewrites the
  position before the current token — fills the draft's KV gap after a
  fully-accepted round, a no-op rewrite otherwise) then ``k - 1`` reuses
  of the existing single-token ``serving.decode.decode_step``;
* target verification: `verify_chunk`, a ``(B, k+1)``-token forward with a
  **per-row dynamic causal offset** (each sequence's chunk starts at its
  own position — ``models.llama.attention`` masks ``key <= row_offset +
  query``), writing chunk KV into the contiguous cache before attending;
* acceptance: `acceptance_step`, one device program producing the output
  tokens, per-row accept counts, and the next PRNG key.

No cache rollback exists or is needed: rejected positions hold stale KV,
but every attention mask is bounded by the row's true position, and the
next round's chunk (length ``k + 1`` ≥ the stale span) rewrites those
positions before any query can attend them — the same trash-steering
invariant the prefill pad path relies on (``serving/decode.py``).

The reference has no serving/inference engine at all (it evaluates on
dequantized fp16 linears, reference ``quant.py:262-279``); this extends
the W4A16 engine the north star mandates.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import PackedLlama, _lin, head_logits


@functools.partial(jax.jit, donate_argnums=(2,))
def verify_chunk(
    model: PackedLlama,
    tokens: jax.Array,  # (B, Q) chunk: [current token, d_1 .. d_{Q-1}]
    cache: kvc.ContiguousKVCache,
    positions: jax.Array,  # (B,) global position of tokens[:, 0]
) -> Tuple[jax.Array, kvc.ContiguousKVCache]:
    """Score a Q-token chunk per sequence in one dispatch.

    Writes the chunk's K/V at ``positions + i`` (batch row == cache slot,
    as in contiguous decode), then attends each chunk token over the cache
    with the per-row causal bound ``key_pos <= positions[b] + i``.
    Returns ``(logits (B, Q, V), cache)`` — ``logits[:, i]`` predicts the
    token at ``positions + i + 1``.
    """
    cfg = model.cfg
    b, qn = tokens.shape
    pos_b = positions[:, None] + jnp.arange(qn)[None]  # (B, Q)
    ropes = [(c.reshape(b, qn, -1), s_.reshape(b, qn, -1))
             for c, s_ in L.rope_tables(cfg, pos_b.reshape(-1))]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    s = cache.max_len

    for li, lp in enumerate(model.layers):
        win = cfg.layer_window(li)

        def attn_fn(q, k, v, li=li, win=win):
            nonlocal cache
            cache = kvc.write_kv_contiguous(cache, li, k, v, pos_b)
            k_all, v_all = cache.k[li, :, :s], cache.v[li, :, :s]
            qq = q
            if cache.k_scales is not None:  # int8 KV: fold k-scale into q
                qq = q * jnp.asarray(cache.k_scales[li],
                                     jnp.float32).astype(q.dtype)
                k_all = k_all.astype(q.dtype)
                v_all = v_all.astype(q.dtype)
            attn = L.attention(qq, k_all, v_all, causal_offset=positions,
                               window=win, sm_scale=cfg.sm_scale_,
                               logit_cap=cfg.attn_logit_softcap,
                               sinks=lp.get("self_attn.sinks"))
            if cache.v_scales is not None:
                attn = attn * jnp.asarray(cache.v_scales[li], attn.dtype)
            return attn, None

        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = L.block_core(cfg, lp, x, cos, sin,
                            lambda name, h, lp=lp: _lin(lp, name, h), attn_fn)
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    return head_logits(cfg, model.lm_head, x), cache


@functools.partial(jax.jit, static_argnames=("return_logprobs",))
def acceptance_step(
    t_logits: jax.Array,  # (B, k+1, V) target chunk logits
    d_logits: jax.Array,  # (B, k, V) draft proposal logits
    d_toks: jax.Array,  # (B, k) proposed tokens
    key: jax.Array,
    temperatures: jax.Array,  # (B,) — <=0 greedy per row
    top_ks: Optional[jax.Array] = None,  # (B,) per-row top-k (0 = off)
    top_ps: Optional[jax.Array] = None,  # (B,) per-row nucleus p (1 = off)
    min_ps: Optional[jax.Array] = None,  # (B,) per-row min-p (0 = off)
    return_logprobs: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized accept/reject + bonus token, one device program.

    Greedy rows accept the longest prefix where the draft token equals the
    target argmax and emit the target argmax at the first mismatch.
    Sampled rows accept token ``i`` iff ``u_i * p_d(d_i) < p_t(d_i)``
    (``u ~ U[0,1)``) and resample the first rejection from
    ``norm(relu(p_t - p_d))``; if all ``k`` are accepted the bonus samples
    from the target's final-position distribution.  Returns
    ``(out_tokens (B, k+1), counts (B,), new_key)`` — row ``b`` emits
    ``out_tokens[b, :counts[b]]``.

    Warped sampling (per-row top-k / top-p / min-p) composes via the
    standard corrected rule: the SAME warp applies to both the target and
    draft logits before their softmaxes (the caller must also sample the
    draft's proposals from the warped distribution — ``sample_per_row``
    with the same arrays), so the accept/resample math targets exactly
    the warped target distribution.  Filtered entries sit at float-min
    and exp to hard zeros.

    ``return_logprobs``: out is instead ``(B, k+1, 2)`` int32 —
    ``pack_tok_logprob`` of each emitted token with its ``log p(token)``
    under the RAW target distribution (unwarped, untempered f32
    log-softmax of the verify logits — the same convention as
    ``Engine(logprobs=True)``); the verify dispatch already computed the
    distribution, so this costs one gather.
    """
    b, k1, v = t_logits.shape
    k = k1 - 1
    greedy = temperatures <= 0.0
    t = jnp.maximum(temperatures, 1e-6).astype(jnp.float32)[:, None, None]
    lg_t = t_logits.astype(jnp.float32) / t
    lg_d = d_logits.astype(jnp.float32) / t
    if top_ks is not None or top_ps is not None or min_ps is not None:
        def rep(a, n):
            return None if a is None else jnp.repeat(a, n, axis=0)

        lg_t = D._warp_logits(lg_t.reshape(b * k1, v), rep(top_ks, k1),
                              rep(top_ps, k1), rep(min_ps, k1)
                              ).reshape(b, k1, v)
        lg_d = D._warp_logits(lg_d.reshape(b * k, v), rep(top_ks, k),
                              rep(top_ps, k), rep(min_ps, k)
                              ).reshape(b, k, v)
    p_t = jax.nn.softmax(lg_t, axis=-1)
    p_d = jax.nn.softmax(lg_d, axis=-1)
    pt_i = jnp.take_along_axis(p_t[:, :k], d_toks[..., None], -1)[..., 0]
    pd_i = jnp.take_along_axis(p_d, d_toks[..., None], -1)[..., 0]
    key, k_u, k_res = jax.random.split(key, 3)
    u = jax.random.uniform(k_u, (b, k))
    t_argmax = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # (B, k+1)
    accept = jnp.where(greedy[:, None], d_toks == t_argmax[:, :k],
                       u * pd_i < pt_i)
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                    axis=1)  # (B,) in [0, k]
    # residual distribution at the first rejected position (sampled rows)
    idx = n_acc[:, None, None]
    p_t_at = jnp.take_along_axis(p_t, jnp.broadcast_to(idx, (b, 1, v)),
                                 1)[:, 0]  # (B, V)
    p_d_pad = jnp.concatenate([p_d, jnp.zeros((b, 1, v), p_d.dtype)], axis=1)
    p_d_at = jnp.take_along_axis(p_d_pad, jnp.broadcast_to(idx, (b, 1, v)),
                                 1)[:, 0]
    res = jnp.where((n_acc < k)[:, None],
                    jnp.maximum(p_t_at - p_d_at, 0.0), p_t_at)
    res_sum = jnp.sum(res, axis=-1, keepdims=True)
    # numerically-empty residual (p_t ~= p_d yet rejected): fall back to p_t
    res = jnp.where(res_sum > 1e-20, res / jnp.maximum(res_sum, 1e-30),
                    p_t_at)
    bonus_sampled = jax.random.categorical(
        k_res, jnp.log(res + 1e-30), axis=-1).astype(jnp.int32)
    bonus_greedy = jnp.take_along_axis(t_argmax, n_acc[:, None], 1)[:, 0]
    bonus = jnp.where(greedy, bonus_greedy, bonus_sampled)
    out = jnp.concatenate([d_toks, jnp.zeros((b, 1), jnp.int32)], axis=1)
    out = out.at[jnp.arange(b), n_acc].set(bonus)
    if return_logprobs:
        # raw-distribution logprob of each emitted token: position i's
        # predictor is t_logits[:, i] (the bonus at n_acc included)
        lsm = jax.nn.log_softmax(t_logits.astype(jnp.float32), axis=-1)
        lps = jnp.take_along_axis(lsm, out[..., None], axis=-1)[..., 0]
        out = jnp.stack(
            [out, jax.lax.bitcast_convert_type(lps, jnp.int32)], axis=-1)
    return out, n_acc + 1, key


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0  # sequence-rounds (speculation rounds x batch rows)
    proposed: int = 0
    accepted: int = 0  # accepted draft tokens (excl. bonus)
    emitted: int = 0  # accepted + bonus

    @property
    def accept_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)

    @property
    def tokens_per_round(self) -> float:
        return self.emitted / max(self.rounds, 1)


def speculative_generate(
    target: PackedLlama,
    draft: PackedLlama,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int,
    k: int = 4,
    temperature: float = 0.0,
    seed: int = 0,
    max_seq_len: Optional[int] = None,
    kv_dtype=None,
    mesh=None,
) -> Tuple[List[List[int]], SpecStats]:
    """Generate ``max_new_tokens`` per prompt with draft-model speculation.

    Both models must share a tokenizer/vocab.  Greedy (``temperature <=
    0``) output is token-identical to plain greedy decoding of ``target``
    for ANY draft; the draft only changes how many dispatches it takes.
    Returns ``(token_lists, stats)``.

    With ``mesh`` the TARGET runs tensor-parallel over the mesh's
    ``model`` axis (weights Megatron-sharded, KV heads sharded, MoE
    experts expert-parallel — ``parallel.tp.build_tp_verify_chunk``)
    while the draft stays single-device: the draft is small and its
    ``k``-step proposal loop is latency-bound, so replicating it buys
    nothing, whereas the target's chunk verification is exactly the
    weight-streaming-bound dispatch TP accelerates.
    """
    assert k >= 1
    cfg = target.cfg
    assert draft.cfg.vocab_size == cfg.vocab_size, "vocab mismatch"
    b = len(prompts)
    lengths = np.asarray([len(p) for p in prompts], np.int32)
    lpad = int(lengths.max())
    if max_seq_len is None:
        max_seq_len = lpad + max_new_tokens + k + 2
    toks = np.zeros((b, lpad), np.int32)
    for i, p in enumerate(prompts):
        toks[i, :len(p)] = p

    def mk_cache(m: PackedLlama):
        ks = vs = None
        dt = m.embed_tokens.dtype
        if kv_dtype is not None:  # int8 KV composes (per-layer scales)
            from gptq_v2_tpu.serving.model import calibrate_kv_scales

            ks, vs = calibrate_kv_scales(m)
            dt = kv_dtype
        return kvc.init_contiguous_cache(
            m.cfg.num_hidden_layers, b, max_seq_len, m.cfg.num_key_value_heads,
            m.cfg.head_dim_, dtype=dt, k_scales=ks, v_scales=vs)

    slot = jnp.arange(b, dtype=jnp.int32)
    temps = jnp.full((b,), temperature, jnp.float32)
    key = jax.random.key(seed)

    t_cache = mk_cache(target)
    d_cache = mk_cache(draft)
    if mesh is not None:
        from gptq_v2_tpu.parallel import tp as TP

        tpm = TP.shard_packed_llama(target, mesh)
        tp_prefill = TP.build_tp_prefill(mesh, t_cache)
        tp_verify = TP.build_tp_verify_chunk(mesh, t_cache)
        t_cache = TP.shard_cache(t_cache, mesh)

        def t_prefill(tk, cache, lens, slot):
            return tp_prefill(tpm, tk, cache, None, lens, slot)

        def t_verify(chunk, cache, pos):
            return tp_verify(tpm, chunk, cache, pos)
    else:
        def t_prefill(tk, cache, lens, slot):
            return D.prefill(target, tk, cache, None, lens, slot=slot)

        def t_verify(chunk, cache, pos):
            return verify_chunk(target, chunk, cache, pos)

    t_lg, t_cache = t_prefill(jnp.asarray(toks), t_cache,
                              jnp.asarray(lengths), slot)
    _, d_cache = D.prefill(draft, jnp.asarray(toks), d_cache, None,
                           jnp.asarray(lengths), slot=slot)
    key, sub = jax.random.split(key)
    cur_tok = D.sample_per_row(t_lg, sub, temps)  # first emitted token
    cur_pos = jnp.asarray(lengths)
    # the token at position cur_pos - 1 — after a fully-accepted round the
    # draft never wrote KV for its last proposal, so each round's first
    # draft step is a 2-token chunk [prev, cur] that (re)writes position
    # cur_pos - 1: a no-op rewrite normally, the gap fill after full accept
    prev_tok = jnp.asarray([p[-1] for p in prompts], jnp.int32)

    emitted: List[List[int]] = [[int(t)] for t in np.asarray(cur_tok)]
    stats = SpecStats()
    while min(len(e) for e in emitted) < max_new_tokens:
        pair = jnp.stack([prev_tok, cur_tok], axis=1)  # (B, 2)
        lg2, d_cache = verify_chunk(draft, pair, d_cache, cur_pos - 1)
        key, sub = jax.random.split(key)
        d_in = D.sample_per_row(lg2[:, 1], sub, temps)
        d_lgs, d_tks = [lg2[:, 1]], [d_in]
        for i in range(1, k):
            lg, d_cache = D.decode_step(draft, d_in, d_cache, None,
                                        cur_pos + i)
            key, sub = jax.random.split(key)
            d_in = D.sample_per_row(lg, sub, temps)
            d_lgs.append(lg)
            d_tks.append(d_in)
        d_logits = jnp.stack(d_lgs, axis=1)  # (B, k, V)
        d_toks = jnp.stack(d_tks, axis=1)  # (B, k)
        chunk = jnp.concatenate([cur_tok[:, None], d_toks], axis=1)
        t_logits, t_cache = t_verify(chunk, t_cache, cur_pos)
        key, sub = jax.random.split(key)
        out, counts, key = acceptance_step(t_logits, d_logits, d_toks, sub,
                                           temps)
        out_np, counts_np = np.asarray(out), np.asarray(counts)
        for r in range(b):
            emitted[r].extend(out_np[r, :counts_np[r]].tolist())
        stats.rounds += b
        stats.proposed += b * k
        stats.accepted += int(counts_np.sum()) - b
        stats.emitted += int(counts_np.sum())
        cur_pos = cur_pos + counts
        rows = jnp.arange(b)
        prev_tok = jnp.where(counts >= 2, out[rows, counts - 2], cur_tok)
        cur_tok = out[rows, counts - 1]
    return [e[:max_new_tokens] for e in emitted], stats
