"""Paged decode attention: ragged-paged-attention kernel + jnp twin.

The serving stack's paged KV layout is kernel-native: per layer
``(n_pages, page_size, 2·n_kv, head_dim)`` with K/V interleaved along the
combined-head axis (``serving/kv_cache.py``).  Decode attention streams
exactly the *valid* pages of each sequence from HBM inside the kernel — no
materialized gather, and no per-sequence ``max_pages`` over-read (the XLA
row-gather alternative measured ~84 GB/s effective on v5e and always reads
the full table).

Kernel: ``jax.experimental.pallas.ops.tpu.ragged_paged_attention`` (the
vLLM-TPU production kernel: grouped-query flash attention over pages with
auto-tuned block sizes per TPU generation).  The reference CUDA framework
has no serving attention at all (it evaluates on dequantized fp16 linears,
reference ``quant.py:262-279``); this component is mandated by the BASELINE
north star, and the jnp twin below is its correctness oracle (the repo-wide
dual-path rule, SURVEY.md §4).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kernel_eligible(kv_pages: jax.Array) -> bool:
    """Static conditions under which the Pallas kernel runs."""
    n_comb, hd = kv_pages.shape[2], kv_pages.shape[3]
    return (jax.default_backend() == "tpu"
            and hd % 128 == 0
            and n_comb % 2 == 0)


def paged_decode_attention(
    q: jax.Array,  # (B, Hq, hd) — one query token per sequence
    kv_pages: jax.Array,  # (n_pages, page_size, 2·n_kv, hd) — K even, V odd
    lengths: jax.Array,  # (B,) valid positions incl. the new token
    block_tables: jax.Array,  # (B, pages_per_seq)
    sliding_window: int | None = None,  # Mistral/Qwen2 local attention
    k_scale: float | None = None,  # int8 KV storage scales (static,
    v_scale: float | None = None,  # per layer; kernel dequantizes in VMEM)
    soft_cap: float | None = None,  # Gemma-2 attn-logit softcapping
    sm_scale: float | None = None,  # score scale; None = 1/sqrt(hd)
    num_kv_pages_per_block: int | None = None,  # kernel tile tuning
    num_queries_per_block: int | None = None,
    vmem_limit_bytes: int | None = None,
    sinks: jax.Array | None = None,  # (Hq,) GPT-OSS attention sinks
    kv_int4: bool = False,  # nibble-packed int8 pages (adjacent pairs)
) -> jax.Array:
    """Returns (B, Hq, hd).  Dispatches to the Pallas kernel when eligible,
    else to the jnp twin.  ``sinks`` / ``kv_int4`` route to the in-repo
    extended fork of the kernel (``ops/_ragged_sink_kernel.py``)."""
    if kernel_eligible(kv_pages):
        if sinks is not None or kv_int4:
            from gptq_v2_tpu.ops._ragged_sink_kernel import (
                ragged_paged_attention,
            )
        else:
            from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
                ragged_paged_attention,
            )

        b, hq, hd = q.shape
        # decode: each sequence contributes exactly one query token
        cu_q_lens = jnp.arange(b + 1, dtype=jnp.int32)
        return ragged_paged_attention(
            q, kv_pages, lengths.astype(jnp.int32),
            block_tables.astype(jnp.int32), cu_q_lens,
            jnp.full((1,), b, jnp.int32),
            sm_scale=1.0 / math.sqrt(hd) if sm_scale is None else sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            num_kv_pages_per_block=num_kv_pages_per_block,
            num_queries_per_block=num_queries_per_block,
            vmem_limit_bytes=vmem_limit_bytes,
            **({"sinks": sinks} if sinks is not None else {}),
            **({"kv_int4": True} if kv_int4 else {}),
        )
    return paged_decode_attention_reference(q, kv_pages, lengths,
                                            block_tables, sliding_window,
                                            k_scale, v_scale, soft_cap,
                                            sm_scale, sinks=sinks,
                                            kv_int4=kv_int4)


def paged_ragged_attention(
    q: jax.Array,  # (T, Hq, hd) — new tokens, grouped by sequence
    kv_pages: jax.Array,  # (n_pages, page_size, 2·n_kv, hd)
    kv_lens: jax.Array,  # (S,) context length per sequence incl. new tokens
    block_tables: jax.Array,  # (S, pages_per_seq)
    cu_q_lens: jax.Array,  # (S+1,) cumulative new-token counts
    num_seqs: jax.Array,  # (1,) int32 — active sequences (dynamic)
    sliding_window: int | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    soft_cap: float | None = None,
    sm_scale: float | None = None,
    num_kv_pages_per_block: int | None = None,
    num_queries_per_block: int | None = None,
    vmem_limit_bytes: int | None = None,
    sinks: jax.Array | None = None,  # (Hq,) GPT-OSS attention sinks
    kv_int4: bool = False,  # nibble-packed int8 pages (adjacent pairs)
) -> jax.Array:
    """Mixed prefill+decode attention over the page pool (vLLM-style
    chunked-prefill): sequence i's rows ``[cu_q_lens[i], cu_q_lens[i+1])``
    attend its cache up to ``kv_lens[i]`` with causal masking inside the
    new-token run.  One program serves every (prefill chunk x decode)
    mix — no per-bucket recompiles.  Returns (T, Hq, hd)."""
    if kernel_eligible(kv_pages):
        if sinks is not None or kv_int4:
            from gptq_v2_tpu.ops._ragged_sink_kernel import (
                ragged_paged_attention,
            )
        else:
            from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
                ragged_paged_attention,
            )

        hd = q.shape[-1]
        return ragged_paged_attention(
            q, kv_pages, kv_lens.astype(jnp.int32),
            block_tables.astype(jnp.int32), cu_q_lens.astype(jnp.int32),
            num_seqs.astype(jnp.int32),
            sm_scale=1.0 / math.sqrt(hd) if sm_scale is None else sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            num_kv_pages_per_block=num_kv_pages_per_block,
            num_queries_per_block=num_queries_per_block,
            vmem_limit_bytes=vmem_limit_bytes,
            **({"sinks": sinks} if sinks is not None else {}),
            **({"kv_int4": True} if kv_int4 else {}),
        )
    return paged_ragged_attention_reference(
        q, kv_pages, kv_lens, block_tables, cu_q_lens, num_seqs,
        sliding_window, k_scale, v_scale, soft_cap, sm_scale, sinks=sinks,
        kv_int4=kv_int4)


def paged_ragged_attention_reference(
    q: jax.Array,
    kv_pages: jax.Array,
    kv_lens: jax.Array,
    block_tables: jax.Array,
    cu_q_lens: jax.Array,
    num_seqs: jax.Array,
    sliding_window: int | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    soft_cap: float | None = None,
    sm_scale: float | None = None,
    sinks: jax.Array | None = None,
    kv_int4: bool = False,
) -> jax.Array:
    """jnp twin: per-token gather of its sequence's pages + masked GQA.

    O(T · S_kv) dense scores — test/debug scale only."""
    _, ps, n_comb, hd = kv_pages.shape
    n_kv = n_comb if kv_int4 else n_comb // 2
    s_seqs, mp = block_tables.shape
    t, hq = q.shape[0], q.shape[1]
    s_kv = mp * ps
    # map each token row to its sequence: seg[r] = i iff cu[i] <= r < cu[i+1]
    rows = jnp.arange(t)
    seg = jnp.searchsorted(cu_q_lens[1:], rows, side="right")  # (T,)
    seg = jnp.minimum(seg, s_seqs - 1)
    valid_row = rows < cu_q_lens[jnp.minimum(num_seqs[0], s_seqs)]
    # token position within the kv sequence: last new token sits at kv_len-1
    n_new = cu_q_lens[seg + 1] - cu_q_lens[seg]
    local = rows - cu_q_lens[seg]
    tok_pos = kv_lens[seg] - n_new + local  # (T,)

    pages = jnp.take(kv_pages, block_tables[seg], axis=0)  # (T, mp, ps, 2kv, hd)
    seq = pages.reshape(t, s_kv, n_comb, hd)
    k, v = seq[:, :, 0::2], seq[:, :, 1::2]
    if kv_int4:
        from gptq_v2_tpu.serving.kv_cache import unpack_int4_rows_adj

        k, v = unpack_int4_rows_adj(k), unpack_int4_rows_adj(v)
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
    if v_scale is not None:
        v = (v.astype(jnp.float32) * v_scale).astype(q.dtype)
    if jnp.issubdtype(v.dtype, jnp.integer):
        # raw codes with scales folded OUTSIDE (per-head int4 path): the
        # PV contraction must still run in float
        k, v = k.astype(q.dtype), v.astype(q.dtype)
    groups = hq // n_kv
    qg = q.reshape(t, n_kv, groups, hd)
    scores = jnp.einsum("tkgh,tskh->tkgs", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(hd) if sm_scale is None else sm_scale)
    if soft_cap is not None:
        scores = jnp.tanh(scores / soft_cap) * soft_cap
    kj = jnp.arange(s_kv)[None, :]
    mask = (kj <= tok_pos[:, None]) & (kj < kv_lens[seg][:, None])
    if sliding_window is not None:
        mask &= kj > tok_pos[:, None] - sliding_window
    mask &= valid_row[:, None]
    scores = jnp.where(mask[:, None, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    if sinks is not None:  # per-head sink logit joins the softmax; its
        sk = jnp.asarray(sinks, jnp.float32).reshape(n_kv, groups)
        sk = jnp.broadcast_to(sk[None, :, :, None], (t, n_kv, groups, 1))
        probs = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1),
                               axis=-1)[..., :-1].astype(v.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    # fully-masked (padding) rows produce garbage probs; zero them
    probs = jnp.where(valid_row[:, None, None, None], probs, 0)
    out = jnp.einsum("tkgs,tskh->tkgh", probs, v)
    return out.reshape(t, hq, hd)


def paged_decode_attention_reference(
    q: jax.Array,
    kv_pages: jax.Array,
    lengths: jax.Array,
    block_tables: jax.Array,
    sliding_window: int | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    soft_cap: float | None = None,
    sm_scale: float | None = None,
    sinks: jax.Array | None = None,
    kv_int4: bool = False,
) -> jax.Array:
    """jnp twin: gather pages, dense masked GQA attention, fp32 softmax."""
    _, ps, n_comb, hd = kv_pages.shape
    n_kv = n_comb if kv_int4 else n_comb // 2
    b, mp = block_tables.shape
    hq = q.shape[1]
    s = mp * ps
    pages = jnp.take(kv_pages, block_tables, axis=0)  # (B, mp, ps, 2kv, hd)
    seq = pages.reshape(b, s, n_comb, hd)
    k, v = seq[:, :, 0::2], seq[:, :, 1::2]
    if kv_int4:
        from gptq_v2_tpu.serving.kv_cache import unpack_int4_rows_adj

        k, v = unpack_int4_rows_adj(k), unpack_int4_rows_adj(v)
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
    if v_scale is not None:
        v = (v.astype(jnp.float32) * v_scale).astype(q.dtype)
    if jnp.issubdtype(v.dtype, jnp.integer):
        # raw codes with scales folded OUTSIDE (per-head int4 path)
        k, v = k.astype(q.dtype), v.astype(q.dtype)
    groups = hq // n_kv
    qg = q.reshape(b, n_kv, groups, hd)
    scores = jnp.einsum("bkgh,bskh->bkgs", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(hd) if sm_scale is None else sm_scale)
    if soft_cap is not None:
        scores = jnp.tanh(scores / soft_cap) * soft_cap
    mask = jnp.arange(s)[None, :] < lengths[:, None]  # (B, S)
    if sliding_window is not None:
        mask &= jnp.arange(s)[None, :] > lengths[:, None] - 1 - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(n_kv, groups)
        sk = jnp.broadcast_to(sk[None, :, :, None], (b, n_kv, groups, 1))
        probs = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1),
                               axis=-1)[..., :-1].astype(v.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgs,bskh->bkgh", probs, v)
    return out.reshape(b, hq, hd)
