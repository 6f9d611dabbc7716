"""Speculative decoding: draft proposal, chunked verify, accept/reject.

Core invariant (Leviathan et al. 2023): greedy speculative output is
token-identical to plain greedy decoding of the target for ANY draft —
the draft only changes the dispatch count.  The oracle is the cache-free
full-recompute greedy loop (itself equivalence-tested against cached
decode in test_serving.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import packed_forward_logits, random_packed_llama
from gptq_v2_tpu.serving.speculative import (
    SpecStats,
    speculative_generate,
    verify_chunk,
)


def _greedy_oracle(model, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = packed_forward_logits(model, jnp.asarray([toks]))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.fixture(scope="module")
def target_draft():
    cfg = L.LlamaConfig.tiny(num_hidden_layers=2)
    target = random_packed_llama(cfg, group_size=16, seed=41,
                                 compute_dtype=jnp.float32)
    dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                              intermediate_size=48, num_attention_heads=2,
                              num_key_value_heads=1)
    draft = random_packed_llama(dcfg, group_size=16, seed=42,
                                compute_dtype=jnp.float32)
    return target, draft


class TestVerifyChunk:
    def test_matches_stepwise_decode(self, target_draft):
        """One (B, Q) chunk dispatch == Q sequential decode_steps: same
        logits at every chunk position, same cache contents after."""
        target, _ = target_draft
        cfg = target.cfg
        rng = np.random.default_rng(43)
        b, plen, q = 2, 5, 4
        prompts = rng.integers(0, cfg.vocab_size, (b, plen)).astype(np.int32)
        chunk = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, q)).astype(np.int32))

        def mk():
            return kvc.init_contiguous_cache(
                cfg.num_hidden_layers, b, 32, cfg.num_key_value_heads,
                cfg.head_dim_, dtype=jnp.float32)

        lens = jnp.full((b,), plen, jnp.int32)
        _, c1 = D.prefill(target, jnp.asarray(prompts), mk(), None, lens,
                          slot=jnp.arange(b))
        _, c2 = D.prefill(target, jnp.asarray(prompts), mk(), None, lens,
                          slot=jnp.arange(b))
        step_logits = []
        for i in range(q):
            lg, c1 = D.decode_step(target, chunk[:, i], c1, None, lens + i)
            step_logits.append(lg)
        want = jnp.stack(step_logits, axis=1)  # (B, Q, V)
        got, c2 = verify_chunk(target, chunk, c2, lens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5 * scale)
        np.testing.assert_allclose(np.asarray(c2.k), np.asarray(c1.k),
                                   rtol=0, atol=1e-6)

    def test_sliding_window_rows_at_different_positions(self):
        """Per-row causal offsets respect the sliding window: a chunk row
        deep in its sequence must mask exactly like stepwise decode."""
        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, sliding_window=6)
        model = random_packed_llama(cfg, group_size=16, seed=44,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(45)
        b, q = 2, 3
        plens = np.asarray([4, 9], np.int32)  # row 1 crosses the window
        lpad = int(plens.max())
        prompts = np.zeros((b, lpad), np.int32)
        for i in range(b):
            prompts[i, :plens[i]] = rng.integers(0, cfg.vocab_size,
                                                 (plens[i],))
        chunk = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, q)).astype(np.int32))

        def mk():
            return kvc.init_contiguous_cache(
                cfg.num_hidden_layers, b, 32, cfg.num_key_value_heads,
                cfg.head_dim_, dtype=jnp.float32)

        lens = jnp.asarray(plens)
        _, c1 = D.prefill(model, jnp.asarray(prompts), mk(), None, lens,
                          slot=jnp.arange(b))
        _, c2 = D.prefill(model, jnp.asarray(prompts), mk(), None, lens,
                          slot=jnp.arange(b))
        step_logits = []
        for i in range(q):
            lg, c1 = D.decode_step(model, chunk[:, i], c1, None, lens + i)
            step_logits.append(lg)
        want = jnp.stack(step_logits, axis=1)
        got, c2 = verify_chunk(model, chunk, c2, lens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5 * scale)


class TestSpeculative:
    @pytest.mark.parametrize("k", [1, 3])
    def test_greedy_matches_target_greedy(self, target_draft, k):
        target, draft = target_draft
        cfg = target.cfg
        rng = np.random.default_rng(46)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (6, 3)]
        out, stats = speculative_generate(target, draft, prompts, 8, k=k)
        for p, o in zip(prompts, out):
            assert o == _greedy_oracle(target, p, 8)
        assert stats.rounds >= 1 and stats.emitted >= 2 * 8 - 2 * k

    def test_self_draft_accepts_everything(self, target_draft):
        """Draft == target: every greedy proposal matches the target argmax,
        so each round emits k+1 tokens and the accept rate is 1."""
        target, _ = target_draft
        cfg = target.cfg
        rng = np.random.default_rng(47)
        prompts = [rng.integers(0, cfg.vocab_size, (5,)).tolist()]
        out, stats = speculative_generate(target, target, prompts, 9, k=3)
        assert out[0] == _greedy_oracle(target, prompts[0], 9)
        assert stats.accept_rate == 1.0
        assert stats.tokens_per_round == 4.0

    def test_moe_sliding_target(self):
        """MoE + sliding-window target through the speculative path."""
        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, sliding_window=8,
                                 moe_num_experts=4, moe_top_k=2,
                                 moe_intermediate_size=32)
        target = random_packed_llama(cfg, group_size=16, seed=48,
                                     compute_dtype=jnp.float32)
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48,
                                  num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=49,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(50)
        # generation crosses the window boundary (8)
        prompts = [rng.integers(0, cfg.vocab_size, (7,)).tolist()]
        out, _ = speculative_generate(target, draft, prompts, 6, k=2)
        assert out[0] == _greedy_oracle(target, prompts[0], 6)

    def test_sampled_deterministic_and_self_draft_accepts(self, target_draft):
        """temperature > 0: same seed reproduces; draft == target accepts
        every proposal (p_t == p_d => acceptance prob 1)."""
        target, draft = target_draft
        cfg = target.cfg
        rng = np.random.default_rng(51)
        prompts = [rng.integers(0, cfg.vocab_size, (4,)).tolist()]
        out1, _ = speculative_generate(target, draft, prompts, 6, k=2,
                                       temperature=0.8, seed=7)
        out2, _ = speculative_generate(target, draft, prompts, 6, k=2,
                                       temperature=0.8, seed=7)
        assert out1 == out2
        assert all(0 <= t < cfg.vocab_size for t in out1[0])
        assert len(out1[0]) == 6

    def test_int8_kv_composes(self, target_draft):
        """Speculative decode over int8 KV caches emits sane tokens and the
        greedy path still matches the target's own int8-cache greedy loop."""
        target, draft = target_draft
        cfg = target.cfg
        rng = np.random.default_rng(52)
        prompt = rng.integers(0, cfg.vocab_size, (5,)).tolist()
        out, _ = speculative_generate(target, draft, [prompt], 6, k=2,
                                      kv_dtype=jnp.int8)
        # oracle: plain greedy over an int8 contiguous cache
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        ks, vs = calibrate_kv_scales(target)
        cache = kvc.init_contiguous_cache(
            cfg.num_hidden_layers, 1, 32, cfg.num_key_value_heads,
            cfg.head_dim_, dtype=jnp.int8, k_scales=ks, v_scales=vs)
        lens = jnp.asarray([len(prompt)], jnp.int32)
        lg, cache = D.prefill(target, jnp.asarray([prompt], jnp.int32), cache,
                              None, lens, slot=jnp.arange(1))
        toks = [int(jnp.argmax(lg[0]))]
        pos = lens
        for _ in range(5):
            lg, cache = D.decode_step(
                target, jnp.asarray([toks[-1]], jnp.int32), cache, None, pos)
            toks.append(int(jnp.argmax(lg[0])))
            pos = pos + 1
        assert out[0] == toks
