"""Prefill + single-token decode steps over the paged KV cache.

Both are pure jittable functions with static shapes: one compilation per
(batch, bucket-length) for prefill and one per (batch, max_pages) for
decode, reused for the whole serving session.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import PackedLlama, packed_block_apply


def fold_paged_kv_scales(qq, ks, vs, n_kv_override=None, kv_offset=None):
    """Per-KV-HEAD int4 scales on the paged path (round-5: the round-4
    engine collapsed them to one per-layer max because the ragged kernel
    fork takes scalar ``k_scale``/``v_scale`` only).  Per-head vectors now
    fold OUTSIDE the kernel — exactly like the contiguous int4 path
    (``_decode_block``): the k-scale multiplies each head's q group (every
    score of a q head uses one kv head, so scaling q == scaling k), and
    the v-scale multiplies the head's output slice (the PV contraction is
    per-kv-head).  The kernel then runs on RAW nibble codes
    (``k_scale=None``).

    ``qq``: ``(..., Hq, hd)``.  ``ks``/``vs``: the per-layer scale entry —
    a float (scalar per-layer: passed through to the kernel) or a tuple of
    per-head floats (folded here).  ``n_kv_override``/``kv_offset``: under
    TP each shard folds its own slice ``[kv_offset, kv_offset + n_kv_loc)``
    of the full per-head tuples (``kv_offset`` may be traced).

    Returns ``(qq, k_scale_for_kernel, v_scale_for_kernel, out_fn)`` where
    ``out_fn`` (or None) applies the v-scale to the kernel output
    ``(..., Hq, hd)``.  The kernel-side scales become 1.0 (the int4 fork
    requires a scale; multiplying raw codes by 1.0 is free next to the
    int→float convert it does anyway)."""
    if ks is None or not (isinstance(ks, tuple) or isinstance(vs, tuple)):
        return qq, ks, vs, None
    hq = qq.shape[-2]
    # mixed scalar/tuple pairs (public kv_scales API): broadcast the
    # scalar side to the tuple side's head count so both fold per head
    n_heads = len(ks) if isinstance(ks, tuple) else len(vs)
    if not isinstance(ks, tuple):
        ks = (float(ks),) * n_heads
    if not isinstance(vs, tuple):
        vs = (float(vs),) * n_heads
    ksa = jnp.asarray(ks, jnp.float32)
    vsa = jnp.asarray(vs, jnp.float32)
    if kv_offset is not None:
        n_loc = n_kv_override
        ksa = jax.lax.dynamic_slice(ksa, (kv_offset,), (n_loc,))
        vsa = jax.lax.dynamic_slice(vsa, (kv_offset,), (n_loc,))
    n_kv = ksa.shape[0]
    shape = (1,) * (qq.ndim - 2) + (hq, 1)
    qq = qq * jnp.repeat(ksa, hq // n_kv).reshape(shape).astype(qq.dtype)

    def out_fn(attn):
        return attn * jnp.repeat(vsa, hq // n_kv).reshape(
            (1,) * (attn.ndim - 2) + (hq, 1)).astype(attn.dtype)

    return qq, 1.0, 1.0, out_fn


@functools.partial(jax.jit, donate_argnums=(2,))
def prefill(
    model: PackedLlama,
    tokens: jax.Array,  # (B, Lpad) — padded prompts
    cache,  # PagedKVCache | ContiguousKVCache
    block_tables: Optional[jax.Array],  # (B, max_pages); None for contiguous
    lengths: jax.Array,  # (B,) true prompt lengths
    slot: Optional[jax.Array] = None,  # (B,) cache slots (contiguous only)
):
    """Run the prompt, write K/V, return logits at each prompt's last real
    token: (B, V).

    Padding tokens sit at positions >= length; causal masking keeps them out
    of real tokens' attention, and their K/V writes are steered somewhere
    harmless (the paged trash page / a position decode overwrites before
    reading).
    """
    cfg = model.cfg
    b, lpad = tokens.shape
    positions = jnp.arange(lpad)
    ropes = L.rope_tables(cfg, positions)
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)
    pos_b = jnp.broadcast_to(positions[None], (b, lpad))
    pad_mask = pos_b >= lengths[:, None]
    contiguous = isinstance(cache, kvc.ContiguousKVCache)
    for li, lp in enumerate(model.layers):
        cos, sin = ropes[cfg.layer_rope(li)]
        x, (k, v) = packed_block_apply(
            cfg, lp, x, cos, sin, window=cfg.layer_window(li),
            chunk=cfg.layer_chunk(li),
            q_scale=L.layer_q_scale(cfg, li, positions),
            qk_l2=cfg.layer_qk_l2(li))
        n_kv, hd = k.shape[2], k.shape[3]
        if contiguous:
            # pad writes clamp to the last position; any real token landing
            # there later rewrites it before it is ever attended to
            kq, vq = kvc.quantize_kv_write(cache, li, k, v)
            wpos = jnp.where(pad_mask, cache.max_len - 1, pos_b)
            rows = jnp.broadcast_to(slot[:, None], wpos.shape)
            cache = cache._replace(
                k=cache.k.at[li, rows, wpos].set(kq),
                v=cache.v.at[li, rows, wpos].set(vq),
            )
        else:
            # pad-token writes steer into the trash page (page 0 is reserved)
            cache = kvc.write_kv(cache, li, k, v, block_tables, pos_b,
                                 pad_mask=pad_mask)
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0]
    from gptq_v2_tpu.serving.model import head_logits

    return head_logits(cfg, model.lm_head, last), cache


@functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("s_bucket",))
def decode_step(
    model: PackedLlama,
    tokens: jax.Array,  # (B,) last sampled token per slot
    cache: kvc.PagedKVCache,
    block_tables: jax.Array,  # (B, max_pages)
    positions: jax.Array,  # (B,) position of the NEW token (== current length)
    s_bucket: Optional[int] = None,
) -> Tuple[jax.Array, kvc.PagedKVCache]:
    """One decode step for every slot; returns (B, V) logits + updated cache.

    ``s_bucket`` (static) bounds the attended context: attention reads only
    the first ``s_bucket`` cache positions (all ``positions`` must be below
    it).  The engine passes power-of-two buckets so short sequences don't
    pay ``max_seq_len`` KV traffic; compilation count stays O(log max_len).
    """
    return _decode_step_impl(model, tokens, cache, block_tables, positions,
                             s_bucket)


def _decode_step_impl(model, tokens, cache, block_tables, positions,
                      s_bucket=None):
    cfg = model.cfg
    b = tokens.shape[0]
    ropes = [(c[:, None, :], s_[:, None, :])  # (B, 1, hd)
             for c, s_ in L.rope_tables(cfg, positions)]  # on-device path
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]  # (B,1,D)

    if isinstance(cache, kvc.ContiguousKVCache):
        s = cache.max_len
    else:
        s = block_tables.shape[1] * cache.page_size
    if s_bucket is not None:
        s = min(s, s_bucket)
    # valid-key masks per attention kind (Gemma-2 alternates sliding/global;
    # each distinct window builds its mask once, shared by its layers)
    base_mask = jnp.arange(s)[None, :] <= positions[:, None]  # (B, S)
    masks = {(None, None): base_mask}
    for li in range(cfg.num_hidden_layers):
        mk = (cfg.layer_window(li), cfg.layer_chunk(li))
        if mk not in masks:
            w, c = mk
            m = base_mask
            if w is not None:
                m = m & (jnp.arange(s)[None, :] > positions[:, None] - w)
            if c is not None:  # Llama-4: keys in the query's chunk only
                m = m & ((jnp.arange(s)[None, :] // c)
                         == (positions[:, None] // c))
            masks[mk] = m

    for li, lp in enumerate(model.layers):
        # write this token's K/V first, then attend over the full cache
        # (the new token's slot is included and valid by the mask).
        win = cfg.layer_window(li)
        cos, sin = ropes[cfg.layer_rope(li)]
        qs = L.layer_q_scale(cfg, li, positions)
        x, cache = _decode_block(cfg, lp, x, cos, sin, cache, li, block_tables,
                                 positions, masks[(win, cfg.layer_chunk(li))],
                                 s, win,
                                 None if qs is None else qs[:, None])
    x = L.rms_norm(x, model.norm, cfg.rms_norm_eps, cfg.norm_unit_offset)
    from gptq_v2_tpu.serving.model import head_logits

    return head_logits(cfg, model.lm_head, x[:, 0]), cache


def _decode_block(cfg, lp, x, cos, sin, cache, li, block_tables, positions,
                  key_mask, s, window, q_scale=None):
    qk_l2 = cfg.layer_qk_l2(li)
    from gptq_v2_tpu.serving.model import _lin

    def attn_fn(q, k, v):
        new_cache = cache
        if isinstance(cache, kvc.ContiguousKVCache) and cache.kv_bits == 4:
            # int4-packed cache: pure-XLA two-pass unpack attention (each
            # nibble half's shift/convert fuses into its own dot, so the
            # packed tensor is read twice = int8 traffic, at HALF the HBM
            # capacity — which is what doubles the servable batch).  A
            # single-read Pallas kernel exists (tested twin) but feeding
            # the cache to an opaque custom call defeats XLA's in-place
            # analysis for the same-step scatter write — measured ~3 full
            # cache copies per step; see docs/STATUS.md round-3 notes.
            from gptq_v2_tpu.ops import contiguous_attention as ca

            new_cache = kvc.write_kv_contiguous(new_cache, li, k, v,
                                                positions[:, None])
            qq = q
            if q_scale is not None:
                qq = qq * q_scale[..., None, None].astype(qq.dtype)
            # scalar or per-kv-head k-scale; per-head repeats across the
            # head's q group (kv-major HF head order) and folds into q
            ks = jnp.asarray(cache.k_scales[li], jnp.float32)
            if ks.ndim:
                ks = jnp.repeat(ks, qq.shape[2] // ks.shape[0]
                                )[None, None, :, None]
            qq = qq * ks.astype(q.dtype)
            attn = ca.contiguous_decode_attention_xla4(
                qq[:, 0], new_cache.k, new_cache.v, positions, li,
                s_bucket=s, sm_scale=cfg.sm_scale_, window=window,
                chunk=cfg.layer_chunk(li),
                soft_cap=cfg.attn_logit_softcap,
                sinks=lp.get("self_attn.sinks"))[:, None]
            vs = jnp.asarray(cache.v_scales[li], jnp.float32)
            if vs.ndim:
                vs = jnp.repeat(vs, attn.shape[2] // vs.shape[0]
                                )[None, None, :, None]
            attn = attn * vs.astype(attn.dtype)
            return attn, new_cache
        if isinstance(cache, kvc.ContiguousKVCache):
            # decode batch == slot order: write row b at its position, then
            # attend over the slot's region in place — no gather
            new_cache = kvc.write_kv_contiguous(new_cache, li, k, v,
                                                positions[:, None])
            qq = q
            if q_scale is not None:  # Llama-4 NoPE temperature (fold into q)
                qq = qq * q_scale[..., None, None].astype(qq.dtype)
            if cache.k_scales is not None:  # int8 KV: fold k_scale into q,
                # cast inline (the int8 cache is what streams from HBM,
                # halving traffic; the convert fuses into the score math)
                qq = qq * jnp.asarray(cache.k_scales[li],
                                      jnp.float32).astype(q.dtype)
            # NB: a fused Pallas decode-attention kernel exists
            # (ops/contiguous_attention.py, tested) but measured SLOWER
            # than this XLA einsum path on v5e (457 vs 515 GB/s on the
            # int8 KV stream, scripts — the einsum already runs at ~93%
            # of the probed HBM ceiling), so the einsum stays production.
            k_all = new_cache.k[li, :, :s].astype(q.dtype)
            v_all = new_cache.v[li, :, :s].astype(q.dtype)
            attn = L.attention(qq, k_all, v_all, causal_offset=None,
                               key_mask=key_mask, sm_scale=cfg.sm_scale_,
                               logit_cap=cfg.attn_logit_softcap,
                               sinks=lp.get("self_attn.sinks"))
            if cache.v_scales is not None:
                attn = attn * jnp.asarray(cache.v_scales[li], attn.dtype)
        else:
            from gptq_v2_tpu.ops.paged_attention import paged_decode_attention

            new_cache = kvc.write_kv(new_cache, li, k, v, block_tables,
                                     positions[:, None])
            n_pages = -(-s // cache.page_size)
            qq = q
            if q_scale is not None:  # Llama-4 NoPE temperature: fold into q
                qq = qq * q_scale[..., None, None].astype(qq.dtype)
            chunk = cfg.layer_chunk(li)
            bt = block_tables[:, :n_pages]
            lens = positions + 1
            if chunk is not None:
                # Llama-4 chunked attention = BLOCK-TABLE REBASING: the
                # query's chunk starts at an attn-chunk boundary, which is
                # page-aligned (engine asserts chunk % page_size == 0), so
                # shifting each row's table to its chunk's first page and
                # rebasing the length gives exactly the chunk mask — the
                # kernel needs no mask extension (rope is baked into K at
                # write time, so absolute positions survive the shift).
                start_pages = (positions // chunk) * (chunk // cache.page_size)
                idx = jnp.clip(jnp.arange(n_pages)[None, :]
                               + start_pages[:, None], 0, bt.shape[1] - 1)
                bt = jnp.take_along_axis(block_tables, idx, axis=1)
                lens = lens - (positions // chunk) * chunk
            # in-kernel page streaming: reads only each seq's valid pages.
            # Tile override: whole-sequence KV blocks + 16-query blocks beat
            # the kernel's auto-tune table by 5-10% on v5e decode at every
            # swept shape (scripts/bench_paged_tuning.py).  Effective
            # sliding windows keep the kernel's own block size — small
            # blocks are what let it skip out-of-window pages.
            b = q.shape[0]
            whole = window is None or window >= s
            ks = None if cache.k_scales is None else cache.k_scales[li]
            vs = None if cache.v_scales is None else cache.v_scales[li]
            qq, ks, vs, out_fn = fold_paged_kv_scales(qq, ks, vs)
            attn = paged_decode_attention(
                qq[:, 0], new_cache.kv[li], lens, bt,
                sliding_window=window,
                sm_scale=cfg.sm_scale_,
                soft_cap=cfg.attn_logit_softcap,
                sinks=lp.get("self_attn.sinks"),
                k_scale=ks, v_scale=vs,
                kv_int4=cache.kv_bits == 4,
                num_kv_pages_per_block=min(n_pages, 128) if whole else None,
                num_queries_per_block=16 if b >= 16 else None,
                vmem_limit_bytes=100 * 1024 * 1024,
            )[:, None]
            if out_fn is not None:
                attn = out_fn(attn)
        return attn, new_cache

    return L.block_core(cfg, lp, x, cos, sin,
                        lambda name, h: _lin(lp, name, h), attn_fn,
                        qk_l2=qk_l2)


@functools.partial(jax.jit, static_argnames=("s_bucket", "return_logprobs"),
                   donate_argnums=(2,))
def decode_sample_step(
    model: PackedLlama,
    tokens: jax.Array,  # (B,)
    cache,
    block_tables: Optional[jax.Array],
    positions: jax.Array,  # (B,)
    temperatures: jax.Array,  # (B,) — <=0 greedy per row
    key: jax.Array,
    s_bucket: Optional[int] = None,
    top_ks: Optional[jax.Array] = None,  # (B,) per-row top-k (0 = off)
    top_ps: Optional[jax.Array] = None,  # (B,) per-row nucleus p (1 = off)
    min_ps: Optional[jax.Array] = None,  # (B,) per-row min-p (0 = off)
    return_logprobs: bool = False,
) -> Tuple[jax.Array, "kvc.PagedKVCache", jax.Array]:
    """Decode + per-row sampling + PRNG-key advance in ONE dispatch.

    The engine's hot step: on remote/tunneled runtimes every separate jit
    call costs a full round trip, so decode, sampling, and the key split
    fuse into a single program.  Returns ``(next_tokens, cache, new_key)``;
    with ``return_logprobs`` the first element is instead the (B, 2) int32
    :func:`pack_tok_logprob` of (token, raw-distribution logprob) so the
    readback stays one transfer.
    """
    logits, cache = _decode_step_impl(model, tokens, cache, block_tables,
                                      positions, s_bucket)
    key, sub = jax.random.split(key)
    toks = sample_per_row(logits, sub, temperatures,
                          top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
    if return_logprobs:
        toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
    return toks, cache, key


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "s_bucket", "return_logprobs"),
                   donate_argnums=(2,))
def decode_sample_multi(
    model: PackedLlama,
    tokens: jax.Array,  # (B,) last sampled token per slot
    cache,
    block_tables: Optional[jax.Array],
    positions: jax.Array,  # (B,) position of the FIRST new token
    temperatures: jax.Array,  # (B,) — <=0 greedy per row
    key: jax.Array,
    n_steps: int,
    s_bucket: Optional[int] = None,  # must cover positions + n_steps
    top_ks: Optional[jax.Array] = None,
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, "kvc.PagedKVCache", jax.Array]:
    """``n_steps`` fused decode+sample steps in ONE dispatch — the engine's
    multi-step tick (``Engine(multi_step=k)``).

    Python-unrolled (straight-line, donation-chained) rather than
    ``lax.scan``: XLA double-buffers a scanned KV-cache carry (measured ~6x
    slower per step), while unrolled steps update the donated cache in
    place.  Compile time grows ~linearly in ``n_steps`` — one-time, and the
    host-sync count per token drops by ``n_steps`` (the engine's dominant
    cost on remote/tunneled runtimes, and a real per-token tax everywhere).
    Returns ``(out (n_steps, B[, 2]), cache, key)`` — one transfer.
    """
    outs = []
    for i in range(n_steps):
        logits, cache = _decode_step_impl(model, tokens, cache, block_tables,
                                          positions + i, s_bucket)
        key, sub = jax.random.split(key)
        tokens = sample_per_row(logits, sub, temperatures,
                                top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
        outs.append(pack_tok_logprob(tokens, chosen_logprob(logits, tokens))
                    if return_logprobs else tokens)
    return jnp.stack(outs), cache, key


def fori_sample_scaffold(n_steps, tokens, state0, key, step_fn,
                         temperatures, top_ks=None, top_ps=None,
                         min_ps=None, return_logprobs=False):
    """The shared k-step decode+sample fori scaffold behind EVERY
    multi-step tick (single-device phased/ragged, TP, PP, MLA, TP-MLA):
    ``step_fn(i, toks, state) -> (logits, state)`` runs the model; the
    scaffold owns the PRNG chain (one split per step), per-row sampling,
    optional token+logprob bitcast packing, and the in-place ``(k, B[,2])``
    output buffer.  One implementation = one place the token-identity
    contract lives; every loop builder passes only its forward."""
    out_shape = ((n_steps, tokens.shape[0], 2) if return_logprobs
                 else (n_steps, tokens.shape[0]))
    out0 = jnp.zeros(out_shape, jnp.int32)

    def body(i, carry):
        toks, state, key, out = carry
        logits, state = step_fn(i, toks, state)
        key, sub = jax.random.split(key)
        toks = sample_per_row(logits, sub, temperatures,
                              top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
        rec = (pack_tok_logprob(toks, chosen_logprob(logits, toks))
               if return_logprobs else toks)
        out = jax.lax.dynamic_update_slice(
            out, rec[None], (i,) + (0,) * (out0.ndim - 1))
        return toks, state, key, out

    _, state, key, out = jax.lax.fori_loop(
        0, n_steps, body, (tokens, state0, key, out0))
    return out, state, key


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "s_bucket", "return_logprobs"),
                   donate_argnums=(2,))
def decode_sample_loop(
    model: PackedLlama,
    tokens: jax.Array,  # (B,) last sampled token per slot
    cache,
    block_tables: Optional[jax.Array],
    positions: jax.Array,  # (B,) position of the FIRST new token
    temperatures: jax.Array,  # (B,) — <=0 greedy per row
    key: jax.Array,
    n_steps: int,
    s_bucket: Optional[int] = None,  # must cover positions + n_steps
    top_ks: Optional[jax.Array] = None,
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, "kvc.PagedKVCache", jax.Array]:
    """``n_steps`` fused decode+sample steps under ONE ``lax.fori_loop``
    dispatch — semantically identical to :func:`decode_sample_multi`
    (same PRNG chain, same outputs) with the body compiled ONCE.

    Resolves the round-3 compile-time wall: the Python-unrolled k-step
    7B program took >25 min to compile on the remote-compile host
    (body duplicated k times), while this loop compiles in ~the cost of
    one step (~30 s warm at 7B, k=32).  Unlike the ``lax.scan`` burst
    (``decode_multi``, measured ~6x slower per step), the while-loop
    carry holds no stacked per-step outputs other than a preallocated
    ``(k, B)`` token buffer updated in place, so XLA's loop buffer
    forwarding keeps the donated KV cache in place: measured device
    time matches the per-dispatch step (27.97 vs 30.07 ms/step at 7B
    b32x1024 incl. the dispatch tax it removes —
    ``scripts/bench_fori_decode.py``).  The engine's default multi-step
    tick (``Engine(multi_step=k)``).
    """
    return fori_sample_scaffold(
        n_steps, tokens, cache, key,
        lambda i, toks, cache: _decode_step_impl(
            model, toks, cache, block_tables, positions + i, s_bucket),
        temperatures, top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
        return_logprobs=return_logprobs)


@functools.partial(jax.jit, static_argnames=("n_steps", "s_bucket"),
                   donate_argnums=(2,))
def decode_multi(
    model: PackedLlama,
    tokens: jax.Array,  # (B,) last sampled token per slot
    cache: kvc.PagedKVCache,
    block_tables: jax.Array,  # (B, max_pages)
    positions: jax.Array,  # (B,) position of the first new token
    n_steps: int,
    s_bucket: Optional[int] = None,  # must cover positions + n_steps
) -> Tuple[jax.Array, jax.Array, kvc.PagedKVCache]:
    """``n_steps`` greedy decode steps under one ``lax.scan``.

    One device dispatch for a whole token burst — for offline greedy
    generation or measuring decode cost without per-step host dispatch.
    The engine deliberately does NOT use it: XLA double-buffers the big
    KV-cache carry through the scan (copies per step measured ~6x slower
    than the donated per-call step), and per-token scheduling is what
    enables continuous batching.  Returns
    ``(tokens (n_steps, B), final_logits, cache)``.
    """

    def body(carry, _):
        toks, cache, pos = carry
        logits, cache = _decode_step_impl(model, toks, cache, block_tables, pos,
                                          s_bucket)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache, pos + 1), (nxt, logits)

    (_, cache, _), (toks, logits) = jax.lax.scan(
        body, (tokens, cache, positions), None, length=n_steps)
    return toks, logits[-1], cache


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("return_logprobs",))
def ragged_step(
    model: PackedLlama,
    tokens: jax.Array,  # (T,) new tokens, grouped by sequence (padded)
    cache: kvc.PagedKVCache,
    positions: jax.Array,  # (T,) each token's position in its sequence
    tok_pages: jax.Array,  # (T,) destination page (0 = trash for padding)
    tok_offs: jax.Array,  # (T,) in-page offset
    block_tables: jax.Array,  # (S, max_pages)
    kv_lens: jax.Array,  # (S,) context length per seq incl. its new tokens
    cu_q_lens: jax.Array,  # (S+1,) cumulative new-token counts
    num_seqs: jax.Array,  # (1,) int32 active sequences
    sample_rows: jax.Array,  # (S,) row index of each sequence's last token
    temperatures: jax.Array,  # (S,) per-sequence (<=0 greedy)
    key: jax.Array,
    top_ks: Optional[jax.Array] = None,  # (S,) per-sequence top-k (0 = off)
    top_ps: Optional[jax.Array] = None,  # (S,) per-sequence nucleus p
    min_ps: Optional[jax.Array] = None,  # (S,) per-sequence min-p (0 = off)
    return_logprobs: bool = False,
) -> Tuple[jax.Array, kvc.PagedKVCache, jax.Array]:
    """Mixed prefill+decode in ONE dispatch (vLLM-style chunked prefill).

    Every tick processes a token budget ``T``: one token per decoding
    sequence plus prompt chunks of admitting sequences, concatenated in
    sequence order.  KV rows are written at host-precomputed (page, offset)
    slots, then the ragged-paged-attention kernel attends each row against
    its sequence's cache with in-run causal masking
    (``ops/paged_attention.paged_ragged_attention``).  One compiled program
    replaces the prefill-bucket x decode-bucket matrix.  Returns
    ``(next_tokens (S,), cache, key)`` — entries only meaningful for
    sequences whose ``sample_rows`` point at a prompt-complete token.
    """
    return _ragged_step_core(model, tokens, cache, positions, tok_pages,
                             tok_offs, block_tables, kv_lens, cu_q_lens,
                             num_seqs, sample_rows, temperatures, key,
                             top_ks, top_ps, min_ps, return_logprobs)


def _ragged_step_core(model, tokens, cache, positions, tok_pages, tok_offs,
                      block_tables, kv_lens, cu_q_lens, num_seqs, sample_rows,
                      temperatures, key, top_ks, top_ps, min_ps,
                      return_logprobs):
    """Unjitted body shared by :func:`ragged_step` and
    :func:`ragged_multi_step`."""
    from gptq_v2_tpu.serving.model import head_logits

    x, cache = _ragged_forward(model, tokens, cache, positions, tok_pages,
                               tok_offs, block_tables, kv_lens, cu_q_lens,
                               num_seqs)
    last = jnp.take(x, sample_rows, axis=0)  # (S, D)
    logits = head_logits(model.cfg, model.lm_head, last)
    key, sub = jax.random.split(key)
    toks = sample_per_row(logits, sub, temperatures,
                          top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
    if return_logprobs:
        toks = pack_tok_logprob(toks, chosen_logprob(logits, toks))
    return toks, cache, key


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "return_logprobs"),
                   donate_argnums=(2,))
def ragged_multi_step(
    model: PackedLlama,
    tokens: jax.Array,  # (S,) current token per sequence (row order)
    cache: kvc.PagedKVCache,
    positions: jax.Array,  # (S,) position of each sequence's FIRST new token
    block_tables: jax.Array,  # (S, max_pages)
    kv_lens: jax.Array,  # (S,) context length incl. the first new token
    num_seqs: jax.Array,  # (1,) int32
    temperatures: jax.Array,  # (S,)
    key: jax.Array,
    n_steps: int,
    top_ks: Optional[jax.Array] = None,
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, kvc.PagedKVCache, jax.Array]:
    """``n_steps`` DECODE-ONLY ragged ticks under ONE ``lax.fori_loop``
    dispatch — the ragged scheduler's multi-step tick
    (``Engine(multi_step=k, scheduler="ragged")``).

    Decode-only means every active sequence contributes exactly one token
    per step (``T = S`` rows, ``cu_q_lens = arange`` capped at
    ``num_seqs``); the per-step (page, offset) write targets derive ON
    DEVICE from the block tables and the advancing positions, so no
    host work happens between the k steps.  Admission pre-allocates each
    sequence's pages through ``prompt + max_new_tokens``, so the tables
    already cover the chunk; a request that stops mid-chunk (EOS /
    max_new) has its tail discarded host-side, and any overshoot KV
    writes land on the reserved trash page via the zero table entries.
    Same body-compiled-once + in-place-cache properties as
    :func:`decode_sample_loop`.
    """
    from gptq_v2_tpu.serving.model import head_logits

    s = tokens.shape[0]
    ps = cache.page_size
    cu = jnp.minimum(jnp.arange(s + 1, dtype=jnp.int32), num_seqs[0])
    sample_rows = jnp.arange(s, dtype=jnp.int32)
    row_active = jnp.arange(s) < num_seqs[0]

    def step_fn(i, toks, cache):
        pos = positions + i
        page_idx = jnp.clip(pos // ps, 0, block_tables.shape[1] - 1)
        pg = jnp.take_along_axis(block_tables, page_idx[:, None],
                                 axis=1)[:, 0]
        pg = jnp.where(row_active, pg, 0)
        of = jnp.where(row_active, pos % ps, 0)
        x, cache = _ragged_forward(model, toks, cache, pos, pg, of,
                                   block_tables, kv_lens + i, cu, num_seqs)
        last = jnp.take(x, sample_rows, axis=0)
        return head_logits(model.cfg, model.lm_head, last), cache

    return fori_sample_scaffold(
        n_steps, tokens, cache, key, step_fn, temperatures,
        top_ks=top_ks, top_ps=top_ps, min_ps=min_ps,
        return_logprobs=return_logprobs)


def _ragged_forward(model, tokens, cache, positions, tok_pages, tok_offs,
                    block_tables, kv_lens, cu_q_lens, num_seqs):
    """The ragged mixed-batch forward shared by :func:`ragged_step` and
    :func:`ragged_spec_step`: write each token's K/V at its host-computed
    (page, offset) slot, attend via the ragged-paged-attention kernel,
    return the final-norm hidden states ``(T, D)`` and the cache."""
    cfg = model.cfg
    from gptq_v2_tpu.serving.model import _lin

    ropes = [(c[:, None, :], s_[:, None, :])  # (T, 1, hd) on-device path
             for c, s_ in L.rope_tables(cfg, positions)]
    x = L.embed_lookup(cfg, model.embed_tokens, tokens)[:, None, :]  # (T,1,D)

    chunk_any = any(cfg.layer_chunk(li) is not None
                    for li in range(cfg.num_hidden_layers))
    if chunk_any:
        # Llama-4: chunked layers attend via REBASED tables (see the
        # decode-path comment).  The scheduler guarantees every
        # sequence's new tokens this tick share one attn chunk, so the
        # per-sequence chunk start derives from its last token's position
        # (= kv_len - 1).
        ac = next(c for c in (cfg.layer_chunk(li)
                              for li in range(cfg.num_hidden_layers))
                  if c is not None)
        starts = ((kv_lens - 1) // ac) * ac
        start_pages = starts // cache.page_size
        mp = block_tables.shape[1]
        idx = jnp.clip(jnp.arange(mp)[None, :] + start_pages[:, None],
                       0, mp - 1)
        bt_chunk = jnp.take_along_axis(block_tables, idx, axis=1)
        kv_lens_chunk = kv_lens - starts

    for li, lp in enumerate(model.layers):

        def attn_fn(q, k, v, li=li):
            from gptq_v2_tpu.ops.paged_attention import paged_ragged_attention

            nonlocal cache
            cache = kvc.write_kv_flat(cache, li, k[:, 0], v[:, 0], tok_pages,
                                      tok_offs)
            qq = q
            qs = L.layer_q_scale(cfg, li, positions)
            if qs is not None:  # Llama-4 NoPE temperature: fold into q
                qq = qq * qs[:, None, None, None].astype(qq.dtype)
            chunked = cfg.layer_chunk(li) is not None
            ks = None if cache.k_scales is None else cache.k_scales[li]
            vs = None if cache.v_scales is None else cache.v_scales[li]
            qq, ks, vs, out_fn = fold_paged_kv_scales(qq, ks, vs)
            attn = paged_ragged_attention(
                qq[:, 0], cache.kv[li],
                kv_lens_chunk if chunked else kv_lens,
                bt_chunk if chunked else block_tables, cu_q_lens,
                num_seqs,
                sliding_window=cfg.layer_window(li),
                sm_scale=cfg.sm_scale_,
                soft_cap=cfg.attn_logit_softcap,
                sinks=lp.get("self_attn.sinks"),
                k_scale=ks, v_scale=vs,
                kv_int4=cache.kv_bits == 4,
            )[:, None]
            if out_fn is not None:
                attn = out_fn(attn)
            return attn, None

        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = L.block_core(cfg, lp, x, cos, sin,
                            lambda name, h, lp=lp: _lin(lp, name, h), attn_fn,
                            qk_l2=cfg.layer_qk_l2(li))

    return L.rms_norm(x[:, 0], model.norm, cfg.rms_norm_eps,
                      cfg.norm_unit_offset), cache  # (T, D)


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("return_logprobs",))
def ragged_spec_step(
    model: PackedLlama,
    tokens: jax.Array,  # (T,) chunk + prompt tokens, grouped by sequence
    cache: kvc.PagedKVCache,
    positions: jax.Array,  # (T,)
    tok_pages: jax.Array,  # (T,) destination page (0 = trash for padding)
    tok_offs: jax.Array,  # (T,)
    block_tables: jax.Array,  # (S, max_pages)
    kv_lens: jax.Array,  # (S,)
    cu_q_lens: jax.Array,  # (S+1,)
    num_seqs: jax.Array,  # (1,)
    sample_rows: jax.Array,  # (S,) last-row per seq (prefill sampling)
    chunk_rows: jax.Array,  # (S, k+1) rows of each DECODING seq's chunk
    seq_slots: jax.Array,  # (S,) engine slot index per sequence
    d_logits: jax.Array,  # (B, k, V) draft logits, indexed by SLOT
    d_toks: jax.Array,  # (B, k) draft proposals, indexed by SLOT
    temperatures: jax.Array,  # (S,)
    key: jax.Array,
    top_ks: Optional[jax.Array] = None,  # (S,) per-sequence warpers
    top_ps: Optional[jax.Array] = None,
    min_ps: Optional[jax.Array] = None,
    return_logprobs: bool = False,
) -> Tuple[jax.Array, kvc.PagedKVCache, jax.Array]:
    """Speculative mixed tick: verify every decoding sequence's
    ``k + 1``-token chunk AND stream admitting sequences' prompt chunks in
    ONE ragged dispatch, with draft accept/reject fused on device.

    Decoding sequences contribute ``[cur, draft_0..draft_{k-1}]`` at
    positions ``len..len+k`` (draft tokens are scattered into the token
    stream ON DEVICE via ``chunk_rows`` — no extra host sync for the
    proposals); their chunk logits are gathered via ``chunk_rows`` and run
    through the standard acceptance rule (``speculative.acceptance_step``).
    Rejected tokens' K/V rows are rewritten by the next tick's chunk
    before any query can attend them — the same no-rollback invariant as
    the contiguous verify path.  Prefill-completing sequences sample their
    first token at ``sample_rows``.  Non-decoding sequences point their
    ``chunk_rows`` at the reserved trash row ``T - 1``.  Returns
    ``(packed (S, k+3) int32, cache, key)`` — one host transfer — where
    ``packed[i] = [first_tok, count, out_0..out_k]``: the host reads
    ``out[:count]`` for decoding sequences and ``first_tok`` for prompt
    completions.

    Warped sampling composes (per-sequence top-k/top-p/min-p arrays feed
    both the fused acceptance rule and the first-token sampler; the
    engine's draft proposals sample from the same warped distribution).
    ``return_logprobs``: packed widens to ``(S, 2k+5)`` —
    ``[..., first_lp_bits, lp_0_bits..lp_k_bits]`` (f32 bitcast) with the
    raw-target-distribution logprob of each token.
    """
    from gptq_v2_tpu.serving.model import head_logits
    from gptq_v2_tpu.serving.speculative import acceptance_step

    s, k1 = chunk_rows.shape
    d_lg = jnp.take(d_logits, seq_slots, axis=0)  # (S, k, V)
    d_tk = jnp.take(d_toks, seq_slots, axis=0)  # (S, k)
    # place the draft proposals at their chunk rows (trash-row writes from
    # non-decoding sequences are padding rows, never attributed to a seq)
    tokens = tokens.at[chunk_rows[:, 1:].reshape(-1)].set(d_tk.reshape(-1))
    x, cache = _ragged_forward(model, tokens, cache, positions, tok_pages,
                               tok_offs, block_tables, kv_lens, cu_q_lens,
                               num_seqs)
    # chunk verification (decoding sequences)
    hc = jnp.take(x, chunk_rows.reshape(-1), axis=0)  # (S*(k+1), D)
    t_logits = head_logits(model.cfg, model.lm_head, hc).reshape(s, k1, -1)
    key, k_acc, k_first = jax.random.split(key, 3)
    out, counts, _ = acceptance_step(t_logits, d_lg, d_tk, k_acc,
                                     temperatures, top_ks=top_ks,
                                     top_ps=top_ps, min_ps=min_ps,
                                     return_logprobs=return_logprobs)
    # first-token sampling (prefill-completing sequences)
    first_logits = head_logits(model.cfg, model.lm_head,
                               jnp.take(x, sample_rows, axis=0))
    first = sample_per_row(first_logits, k_first, temperatures,
                           top_ks=top_ks, top_ps=top_ps, min_ps=min_ps)
    if return_logprobs:
        out, lps = out[..., 0], out[..., 1]  # (S, k+1) each; lps = f32 bits
        first_lp = jax.lax.bitcast_convert_type(
            chosen_logprob(first_logits, first), jnp.int32)
        packed = jnp.concatenate([first[:, None], counts[:, None], out,
                                  first_lp[:, None], lps], axis=1)
    else:
        packed = jnp.concatenate([first[:, None], counts[:, None], out],
                                 axis=1)
    return packed, cache, key


def _warp_logits(
    lg: jax.Array,  # (B, V) f32, already temperature-scaled
    top_ks: Optional[jax.Array],  # (B,) int32; <=0 disables for that row
    top_ps: Optional[jax.Array],  # (B,) f32; >=1 disables for that row
    min_ps: Optional[jax.Array] = None,  # (B,) f32; <=0 disables
) -> jax.Array:
    """Per-row top-k, then nucleus (top-p), then min-p filtering (the HF
    warper order: temperature → top-k → top-p → min-p, each measured on
    the already-restricted distribution).  One shared descending sort
    serves the first two; min-p needs none (``p_i / p_max >= min_p  ⇔
    lg_i >= max(lg) + log(min_p)``).  Rows with a filter disabled pass
    through unchanged, so a single program covers any per-request mix."""
    neg = jnp.finfo(jnp.float32).min
    v = lg.shape[-1]
    if top_ks is not None or top_ps is not None:
        srt = jnp.sort(lg, axis=-1)[:, ::-1]
    if top_ks is not None:
        k = jnp.clip(jnp.where(top_ks > 0, top_ks, v), 1, v)
        kth = jnp.take_along_axis(srt, (k - 1)[:, None], axis=-1)
        lg = jnp.where(lg >= kth, lg, neg)
        srt = jnp.where(jnp.arange(v)[None, :] < k[:, None], srt, neg)
    if top_ps is not None:
        p = jnp.clip(top_ps, 0.0, 1.0)[:, None]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix whose mass reaches p: token j survives if
        # the mass strictly before it is < p (so >=1 token always survives)
        keep = (cum - probs) < jnp.maximum(p, 1e-9)
        last = jnp.sum(keep, axis=-1) - 1
        thr = jnp.take_along_axis(srt, last[:, None], axis=-1)
        lg = jnp.where(lg >= thr, lg, neg)
    if min_ps is not None:
        mx = jnp.max(lg, axis=-1, keepdims=True)  # the max always survives
        thr = jnp.where(min_ps[:, None] > 0.0,
                        mx + jnp.log(jnp.clip(min_ps[:, None], 1e-38, 1.0)),
                        neg)
        lg = jnp.where(lg >= thr, lg, neg)
    return lg


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_per_row(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    temperatures: jax.Array,  # (B,) — <=0 means greedy for that row
    top_k: int = 0,
    top_ks: Optional[jax.Array] = None,  # (B,) per-row top-k (0 = off)
    top_ps: Optional[jax.Array] = None,  # (B,) per-row nucleus p (1 = off)
    min_ps: Optional[jax.Array] = None,  # (B,) per-row min-p (0 = off)
) -> jax.Array:
    """Per-row temperature sampling: each batch row uses its own request's
    temperature (rows at <=0 take the argmax), optionally its own top-k /
    top-p / min-p.  One compilation regardless of the parameter mix — the
    engine's sampling path."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32)
    if top_k > 0:
        kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
        lg = jnp.where(lg >= kth, lg, jnp.finfo(jnp.float32).min)
    t = jnp.maximum(temperatures, 1e-6)[:, None].astype(jnp.float32)
    lg = lg / t
    if top_ks is not None or top_ps is not None or min_ps is not None:
        lg = _warp_logits(lg, top_ks, top_ps, min_ps)
    sampled = jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures <= 0.0, greedy, sampled)


def chosen_logprob(logits: jax.Array, toks: jax.Array) -> jax.Array:
    """log p(token) under the RAW model distribution (f32 log-softmax of
    the unwarped, untempered logits) — the eval-meaningful quantity, per
    the OpenAI/vLLM logprobs convention for the sampled token."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lsm, toks[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]


def pack_tok_logprob(toks: jax.Array, lps: jax.Array) -> jax.Array:
    """(B,) int32 tokens + (B,) f32 logprobs → (B, 2) int32 (logprob
    bitcast), so a tick's host readback stays ONE transfer."""
    return jnp.stack(
        [toks, jax.lax.bitcast_convert_type(lps, jnp.int32)], axis=1)


def unpack_tok_logprob(packed: "np.ndarray"):
    """Host-side inverse of :func:`pack_tok_logprob`."""
    import numpy as np

    return packed[:, 0], packed[:, 1].view(np.float32)


@functools.partial(jax.jit, static_argnames=("temperature", "top_k"))
def sample(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
) -> jax.Array:
    """Greedy (temperature 0) or temperature/top-k sampling. Returns (B,)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits >= kth, logits, jnp.finfo(jnp.float32).min)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
