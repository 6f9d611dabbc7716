"""Serving stack: packed model, paged KV cache, decode, continuous batching."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.pipeline import QuantConfig, quantize_model
from gptq_v2_tpu.serving import Engine, Request
from gptq_v2_tpu.serving.model import (
    PackedLlama,
    dequantized_params,
    packed_forward_logits,
    quantize_params_to_packed,
)


@pytest.fixture(scope="module")
def packed_model():
    cfg = L.LlamaConfig.tiny(dtype="float32")
    params = L.init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
    params_q = {
        "embed_tokens": params["embed_tokens"],
        "layers": [dict(lp) for lp in params["layers"]],
        "norm": params["norm"],
        "lm_head": params["lm_head"],
    }
    results = quantize_model(cfg, params_q, calib, QuantConfig(bits=4, group_size=16),
                             batch_size=4)
    return quantize_params_to_packed(cfg, params_q, results["data"],
                                     compute_dtype=jnp.float32), params_q


class TestPackedModel:
    def test_packed_forward_matches_dense_dequant(self, packed_model):
        model, params_q = packed_model
        rng = np.random.default_rng(3)
        tokens = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (2, 12)))
        packed = packed_forward_logits(model, tokens)
        dense = L.forward_logits(model.cfg, dequantized_params(model, jnp.float32),
                                 tokens)
        scale = float(jnp.abs(dense).max())
        np.testing.assert_allclose(np.asarray(packed), np.asarray(dense),
                                   rtol=0, atol=5e-3 * scale)


def greedy_full_recompute(model: PackedLlama, prompt, n_new):
    """Oracle: greedy decode by full forward each step (no cache)."""
    toks = list(prompt)
    for _ in range(n_new):
        logits = packed_forward_logits(model, jnp.asarray([toks]))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestEngine:
    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_incremental_decode_matches_full_recompute(self, packed_model, kind):
        model, _ = packed_model
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()
        expected = greedy_full_recompute(model, prompt, 6)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=6)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_qwen2_style_decode_matches_full_recompute(self, kind):
        """QKV biases + sliding window through the serving stack: cached
        decode must equal the windowed full recompute."""
        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, qkv_bias=True,
                                 sliding_window=8)
        model = random_packed_llama(cfg, group_size=16, seed=9,
                                    compute_dtype=jnp.float32)
        assert "self_attn.q_proj.bias" in model.layers[0]
        rng = np.random.default_rng(4)
        # prompt + generation crosses the window boundary (8)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_qwen3_style_decode_matches_full_recompute(self, kind):
        """Qwen3 QK-norm through the serving stack."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, qk_norm=True)
        model = random_packed_llama(cfg, group_size=16, seed=21,
                                    compute_dtype=jnp.float32)
        assert "self_attn.q_norm" in model.layers[0]
        rng = np.random.default_rng(22)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_gemma2_style_decode_matches_full_recompute(self, kind):
        """Gemma-2 switches through the whole serving stack (sandwich norms,
        softcaps, embed normalizer, alternating sliding/global layers):
        cached decode — incl. the chunked-prefill ragged scheduler — must
        equal the full recompute."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=16.0,
            layer_types=("sliding_attention", "full_attention"))
        model = random_packed_llama(cfg, group_size=16, seed=13,
                                    compute_dtype=jnp.float32)
        assert "pre_feedforward_layernorm" in model.layers[0]
        rng = np.random.default_rng(14)
        # prompt + generation crosses the window boundary (8)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_gemma3_style_decode_matches_full_recompute(self, kind):
        """Gemma-3 through the whole serving stack: the local/global rope
        split (sliding layers at 10k theta, full layers at 1M) + QK-norm +
        Gemma norms; cached decode on all three schedulers must equal the
        full recompute."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True, qk_norm=True,
            query_pre_attn_scalar=16.0, rope_theta=1000000.0,
            rope_local_base_freq=10000.0,
            layer_types=("sliding_attention", "full_attention"))
        assert cfg.layer_rope(0) == 1 and cfg.layer_rope(1) == 0
        model = random_packed_llama(cfg, group_size=16, seed=43,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(44)
        # prompt + generation crosses the window boundary (8)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_smollm3_style_decode_matches_full_recompute(self, kind):
        """NoPE layers through the serving stack: cached decode (identity
        rope table on the no-rope layer) equals the full recompute."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, nope_layers=(1,))
        assert cfg.layer_rope(0) == 0 and cfg.layer_rope(1) == 1
        model = random_packed_llama(cfg, group_size=16, seed=45,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(46)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_olmo2_style_decode_matches_full_recompute(self, kind):
        """OLMo-2 switches through the serving stack (post-norm-only block,
        flat QK-norm)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, postnorm_only=True,
                                 qk_norm_flat=True)
        model = random_packed_llama(cfg, group_size=16, seed=47,
                                    compute_dtype=jnp.float32)
        assert "input_layernorm" not in model.layers[0]
        rng = np.random.default_rng(48)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_glm4_style_decode_matches_full_recompute(self, kind):
        """GLM-4 switches through the serving stack: partial rotary (half
        the head dims pass through), sandwich norms, QKV biases."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, qkv_bias=True,
                                 sandwich_norms=True,
                                 partial_rotary_factor=0.5)
        model = random_packed_llama(cfg, group_size=16, seed=49,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(50)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_mla_decode_matches_full_recompute(self, kind):
        """DeepSeek MLA through the serving stack: compressed-latent
        attention with the padded-v cache on all three schedulers."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        assert cfg.head_dim_ == 24 and cfg.rope_dim_ == 8
        model = random_packed_llama(cfg, group_size=16, seed=51,
                                    compute_dtype=jnp.float32)
        assert hasattr(model.layers[0]["self_attn.kv_b_proj"], "qweight")
        rng = np.random.default_rng(52)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_gpt_oss_style_decode_matches_full_recompute(self, kind):
        """GPT-OSS switches through the serving stack on EVERY cache
        layout (sinks: dense einsum on contiguous, the sink-extended
        ragged-kernel fork / its jnp twin on paged+ragged): learned
        sinks, biased router, per-expert biases, clamped GLU,
        sliding/full layers."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=53,
                                    compute_dtype=jnp.float32)
        assert model.layers[0]["self_attn.sinks"].shape == (4,)
        assert "mlp.experts.0.gate_proj.bias" in model.layers[0]
        rng = np.random.default_rng(54)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_llama4_style_decode_matches_full_recompute(self, kind):
        """Llama-4 switches through the serving stack on every cache
        layout (paged/ragged run chunk masks by block-table rebasing):
        chunked attention crossing a chunk boundary, NoPE layer with
        temperature tuning biting at test positions, rope-layer-only QK
        L2 norm, input-scaled MoE + shared expert."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, nope_layers=(1,),
            layer_types=("chunked_attention", "full_attention"),
            attn_chunk_size=8, qk_l2_norm=True, attn_temp_tuning=True,
            attn_floor_scale=8.0, attn_scale_coef=0.2,
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            moe_dense_layers=(0,), moe_llama4=True, moe_shared_experts=1,
            intermediate_size_dense=48)
        assert cfg.layer_qk_l2(0) and not cfg.layer_qk_l2(1)
        model = random_packed_llama(cfg, group_size=16, seed=63,
                                    compute_dtype=jnp.float32)
        assert "mlp.shared_experts.gate_proj" in model.layers[1]
        rng = np.random.default_rng(64)
        # prompt + generation crosses the chunk boundary (8) and the
        # temperature floor (8)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged", "ragged"])
    def test_moe_decode_matches_full_recompute(self, kind):
        """Mixtral-style MoE through the whole serving stack: masked-dense
        experts on packed INT4 weights, bf16 router, all three schedulers."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32)
        model = random_packed_llama(cfg, group_size=16, seed=33,
                                    compute_dtype=jnp.float32)
        lp0 = model.layers[0]
        assert not hasattr(lp0["mlp.router"], "qweight")  # router stays dense
        assert hasattr(lp0["mlp.experts.3.down_proj"], "qweight")
        rng = np.random.default_rng(34)
        prompt = rng.integers(0, cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        kw = (dict(cache_kind="paged", scheduler="ragged", token_budget=8)
              if kind == "ragged" else dict(cache_kind=kind))
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64, **kw)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_int8_kv_cache_close_to_native(self, packed_model, kind):
        """int8 KV (per-layer calibrated scales) tracks the full-precision
        cache: per-step decode logits within int8-noise tolerance.  (Token-
        sequence agreement is not asserted — tiny random models have
        near-flat logits where any lossy cache flips argmaxes.)"""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        cfg = model.cfg
        scales = calibrate_kv_scales(model)
        assert len(scales[0]) == cfg.num_hidden_layers
        assert all(s > 0 for s in scales[0] + scales[1])

        rng = np.random.default_rng(12)
        B, PLEN, PS, MAXP = 2, 9, 8, 4
        prompts = rng.integers(0, cfg.vocab_size, (B, PLEN)).astype(np.int32)
        lengths = jnp.full((B,), PLEN, jnp.int32)

        def run(kv_dtype, kv_scales):
            if kind == "contiguous":
                cache = kvc.init_contiguous_cache(
                    cfg.num_hidden_layers, B, PS * MAXP,
                    cfg.num_key_value_heads, cfg.head_dim_, dtype=kv_dtype,
                    k_scales=kv_scales and kv_scales[0],
                    v_scales=kv_scales and kv_scales[1])
                bt, slot = None, jnp.arange(B)
            else:
                cache = kvc.init_cache(
                    cfg.num_hidden_layers, 1 + B * MAXP, PS,
                    cfg.num_key_value_heads, cfg.head_dim_, dtype=kv_dtype,
                    k_scales=kv_scales and kv_scales[0],
                    v_scales=kv_scales and kv_scales[1])
                bt, slot = jnp.asarray(
                    1 + np.arange(B * MAXP).reshape(B, MAXP), jnp.int32), None
            logits, cache = D.prefill(model, jnp.asarray(prompts), cache, bt,
                                      lengths, slot=slot)
            outs = [logits]
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            for step in range(3):
                pos = jnp.full((B,), PLEN + step, jnp.int32)
                logits, cache = D.decode_step(model, toks, cache, bt, pos,
                                              s_bucket=32)
                outs.append(logits)
                toks = jnp.argmax(logits, -1).astype(jnp.int32)
            return outs

        native = run(model.embed_tokens.dtype, None)
        quant = run(jnp.int8, scales)
        for i, (a, b) in enumerate(zip(native, quant)):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 0.06, (i, rel)
        # prefill writes don't affect prefill logits: step 0 exact-ish
        rel0 = float(jnp.max(jnp.abs(native[0] - quant[0]))
                     / jnp.max(jnp.abs(native[0])))
        assert rel0 < 1e-5, rel0

    def test_int4_kv_cache_close_to_native(self, packed_model):
        """int4-packed KV (contiguous; Pallas kernel path / jnp twin
        off-TPU) tracks the full-precision cache within int4-noise
        tolerance."""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        cfg = model.cfg
        scales = calibrate_kv_scales(model, bits=4)

        rng = np.random.default_rng(12)
        B, PLEN = 2, 9
        prompts = rng.integers(0, cfg.vocab_size, (B, PLEN)).astype(np.int32)
        lengths = jnp.full((B,), PLEN, jnp.int32)
        steps = np.random.default_rng(17).integers(
            0, cfg.vocab_size, (3, B)).astype(np.int32)

        def roundtrip(cache):
            # simulate int4 storage on the full-precision cache: snap every
            # written K/V value to its layer's PER-HEAD int4 grid
            n_kv = cfg.num_key_value_heads
            ks = jnp.asarray(scales[0]).reshape(-1, 1, 1, n_kv, 1)
            vs = jnp.asarray(scales[1]).reshape(-1, 1, 1, n_kv, 1)
            return cache._replace(
                k=(jnp.clip(jnp.round(cache.k / ks), -7, 7) * ks
                   ).astype(cache.k.dtype),
                v=(jnp.clip(jnp.round(cache.v / vs), -7, 7) * vs
                   ).astype(cache.v.dtype))

        def run(kv_bits, kv_scales, simulate=False):
            cache = kvc.init_contiguous_cache(
                cfg.num_hidden_layers, B, 32,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=model.embed_tokens.dtype,
                k_scales=kv_scales and kv_scales[0],
                v_scales=kv_scales and kv_scales[1], kv_bits=kv_bits)
            if kv_bits == 4:
                assert cache.k.shape[-2] == cfg.num_key_value_heads // 2
                assert cache.k.dtype == jnp.int8
            logits, cache = D.prefill(model, jnp.asarray(prompts), cache,
                                      None, lengths, slot=jnp.arange(B))
            outs = [logits]
            # fixed token trajectory: int4 noise flips argmaxes on a tiny
            # random model, which would compare diverged *sequences* rather
            # than cache fidelity — drive both runs with the same tokens
            for step in range(3):
                if simulate:
                    cache = roundtrip(cache)
                pos = jnp.full((B,), PLEN + step, jnp.int32)
                logits, cache = D.decode_step(model, jnp.asarray(steps[step]),
                                              cache, None, pos, s_bucket=32)
                outs.append(logits)
            return outs

        native = run(None, None)
        quant = run(4, scales)
        sim = run(None, None, simulate=True)
        # the int4 path tracks the SIMULATED int4 grid (residual: the
        # in-step new-token write — the real path quantizes it before the
        # same-step attend, the simulation attends it at full precision —
        # one token of int4 noise on a near-flat tiny-model logit surface;
        # a scale mis-fold would blow this up ~40x)
        for i, (a, b) in enumerate(zip(sim, quant)):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 0.15, (i, rel)
        rel0 = float(jnp.max(jnp.abs(native[0] - quant[0]))
                     / jnp.max(jnp.abs(native[0])))
        assert rel0 < 1e-5, rel0  # prefill attends on fresh bf16 K/V

    def test_int4_kv_gemma2_style_variants(self):
        """int4 KV composes with sliding windows + softcaps + sandwich
        norms (the xla4 path's window/soft_cap params) end to end."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=16.0,
            layer_types=("sliding_attention", "full_attention"))
        model = random_packed_llama(cfg, group_size=16, seed=13,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(14)
        prompt = rng.integers(0, cfg.vocab_size, (11,)).tolist()
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="contiguous", kv_dtype="int4")
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert len(out[0]) == 5

    def test_int4_kv_engine_end_to_end(self, packed_model):
        """Engine integration: kv_dtype="int4" runs on the contiguous
        cache with auto-calibrated scales."""
        model, _ = packed_model
        rng = np.random.default_rng(13)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="contiguous", kv_dtype="int4")
        assert eng.cache.kv_bits == 4
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert len(out[0]) == 5

    def test_int4_kv_paged_close_to_simulated(self, packed_model):
        """Paged int4 cache (nibble-packed int8 pages, adjacent-pair
        layout): a fixed token trajectory's decode logits track a
        full-precision paged cache whose written K/V are SNAPPED to the
        same scalar int4 grid (the same methodology as the contiguous
        int4 test — a scale/pairing mis-fold would blow this up ~40x)."""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        cfg = model.cfg
        per_head = calibrate_kv_scales(model, bits=4)
        ks = tuple(max(s) for s in per_head[0])  # scalar per layer
        vs = tuple(max(s) for s in per_head[1])

        rng = np.random.default_rng(33)
        B, PLEN, PS = 2, 9, 8
        n_pages = 1 + B * 4
        prompts = rng.integers(0, cfg.vocab_size, (B, PLEN)).astype(np.int32)
        lengths = jnp.full((B,), PLEN, jnp.int32)
        bt = jnp.asarray(np.arange(1, 1 + B * 4).reshape(B, 4), jnp.int32)
        steps = np.random.default_rng(34).integers(
            0, cfg.vocab_size, (3, B)).astype(np.int32)

        def roundtrip(cache):
            kq = jnp.asarray(ks).reshape(-1, 1, 1, 1, 1)
            vq = jnp.asarray(vs).reshape(-1, 1, 1, 1, 1)
            k = cache.kv[:, :, :, 0::2]
            v = cache.kv[:, :, :, 1::2]
            k = (jnp.clip(jnp.round(k / kq), -7, 7) * kq).astype(cache.kv.dtype)
            v = (jnp.clip(jnp.round(v / vq), -7, 7) * vq).astype(cache.kv.dtype)
            kv = jnp.stack([k, v], axis=4).reshape(cache.kv.shape)
            return cache._replace(kv=kv)

        def run(kv_bits, simulate=False):
            cache = kvc.init_cache(
                cfg.num_hidden_layers, n_pages, PS,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=model.embed_tokens.dtype,
                k_scales=ks if kv_bits == 4 else None,
                v_scales=vs if kv_bits == 4 else None, kv_bits=kv_bits)
            if kv_bits == 4:
                assert cache.kv.shape[3] == cfg.num_key_value_heads
                assert cache.kv.dtype == jnp.int8
            logits, cache = D.prefill(model, jnp.asarray(prompts), cache,
                                      bt, lengths)
            outs = [logits]
            for step in range(3):
                if simulate:
                    cache = roundtrip(cache)
                pos = jnp.full((B,), PLEN + step, jnp.int32)
                logits, cache = D.decode_step(model, jnp.asarray(steps[step]),
                                              cache, bt, pos)
                outs.append(logits)
            return outs

        quant = run(4)
        sim = run(None, simulate=True)
        for i, (a, b) in enumerate(zip(sim, quant)):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 0.15, (i, rel)

    def test_int4_kv_paged_engine_schedulers(self, packed_model):
        """Engine smoke: kv_dtype="int4" + paged cache serves through the
        phased AND ragged schedulers with auto-calibrated PER-KV-HEAD
        scales (round-5: the per-layer max collapse is gone)."""
        model, _ = packed_model
        cfg = model.cfg
        rng = np.random.default_rng(31)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (9, 14)]
        for scheduler in ("phased", "ragged"):
            eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                         cache_kind="paged", kv_dtype="int4",
                         scheduler=scheduler)
            assert eng.cache.kv_bits == 4
            assert all(isinstance(s, tuple)
                       and len(s) == cfg.num_key_value_heads
                       for s in eng.cache.k_scales)
            out = eng.run([Request(uid=i, prompt=p, max_new_tokens=6)
                           for i, p in enumerate(prompts)])
            assert all(len(out[i]) == 6 for i in range(len(prompts)))

    def test_int4_kv_paged_per_head_close_to_simulated(self, packed_model):
        """Paged int4 with PER-KV-HEAD scales: decode logits track a
        full-precision paged cache snapped to each head's own int4 grid
        (the contiguous path's methodology).  A mis-indexed head fold —
        wrong repeat order, wrong slice — would blow this up."""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        cfg = model.cfg
        ks, vs = calibrate_kv_scales(model, bits=4)  # per-head tuples
        assert all(isinstance(s, tuple) for s in ks)

        rng = np.random.default_rng(43)
        B, PLEN, PS = 2, 9, 8
        n_pages = 1 + B * 4
        prompts = rng.integers(0, cfg.vocab_size, (B, PLEN)).astype(np.int32)
        lengths = jnp.full((B,), PLEN, jnp.int32)
        bt = jnp.asarray(np.arange(1, 1 + B * 4).reshape(B, 4), jnp.int32)
        steps = np.random.default_rng(44).integers(
            0, cfg.vocab_size, (3, B)).astype(np.int32)

        def roundtrip(cache):
            # (L, n_kv) per-head grids; K even, V odd on the combined axis
            kq = jnp.asarray(ks)[:, None, None, :, None]
            vq = jnp.asarray(vs)[:, None, None, :, None]
            k = cache.kv[:, :, :, 0::2]
            v = cache.kv[:, :, :, 1::2]
            k = (jnp.clip(jnp.round(k / kq), -7, 7) * kq).astype(cache.kv.dtype)
            v = (jnp.clip(jnp.round(v / vq), -7, 7) * vq).astype(cache.kv.dtype)
            kv = jnp.stack([k, v], axis=4).reshape(cache.kv.shape)
            return cache._replace(kv=kv)

        def run(kv_bits, simulate=False):
            cache = kvc.init_cache(
                cfg.num_hidden_layers, n_pages, PS,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=model.embed_tokens.dtype,
                k_scales=ks if kv_bits == 4 else None,
                v_scales=vs if kv_bits == 4 else None, kv_bits=kv_bits)
            logits, cache = D.prefill(model, jnp.asarray(prompts), cache,
                                      bt, lengths)
            outs = [logits]
            for step in range(3):
                if simulate:
                    cache = roundtrip(cache)
                pos = jnp.full((B,), PLEN + step, jnp.int32)
                logits, cache = D.decode_step(model, jnp.asarray(steps[step]),
                                              cache, bt, pos)
                outs.append(logits)
            return outs

        quant = run(4)
        sim = run(None, simulate=True)
        for i, (a, b) in enumerate(zip(sim, quant)):
            rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
            assert rel < 0.15, (i, rel)

    def test_int4_kv_mixed_scalar_tuple_scales(self, packed_model):
        """Public API edge: per-head k scales with SCALAR v scales (any
        mix is accepted by kv_scales) — the fold broadcasts the scalar
        side per head; the engine serves end-to-end."""
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        ks, vs = calibrate_kv_scales(model, bits=4)
        vs_scalar = tuple(max(s) for s in vs)
        rng = np.random.default_rng(49)
        prompt = rng.integers(0, model.cfg.vocab_size, (9,)).tolist()
        eng = Engine(model, max_batch=1, page_size=8, max_seq_len=64,
                     cache_kind="paged", kv_dtype="int4",
                     kv_scales=(ks, vs_scalar))
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert len(out[0]) == 5

    def test_int4_kv_per_head_beats_or_matches_collapsed(self, packed_model):
        """Quality guard for the round-4 collapse removal: against the
        exact-rounded oracle (full-precision cache snapped per head), the
        per-head paged engine's decode logits are at least as close as a
        collapsed-scalar cache's.  (The A/B the round-4 verdict asked
        for, in logits space where the CPU-size model has signal.)"""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model, _ = packed_model
        cfg = model.cfg
        ks, vs = calibrate_kv_scales(model, bits=4)
        ks_c = tuple(max(s) for s in ks)
        vs_c = tuple(max(s) for s in vs)

        rng = np.random.default_rng(47)
        B, PLEN, PS = 2, 9, 8
        n_pages = 1 + B * 4
        prompts = rng.integers(0, cfg.vocab_size, (B, PLEN)).astype(np.int32)
        lengths = jnp.full((B,), PLEN, jnp.int32)
        bt = jnp.asarray(np.arange(1, 1 + B * 4).reshape(B, 4), jnp.int32)
        steps = np.random.default_rng(48).integers(
            0, cfg.vocab_size, (4, B)).astype(np.int32)

        def run(k_scales, v_scales, kv_bits):
            cache = kvc.init_cache(
                cfg.num_hidden_layers, n_pages, PS,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=model.embed_tokens.dtype,
                k_scales=k_scales, v_scales=v_scales, kv_bits=kv_bits)
            logits, cache = D.prefill(model, jnp.asarray(prompts), cache,
                                      bt, lengths)
            outs = [logits]
            for step in range(4):
                pos = jnp.full((B,), PLEN + step, jnp.int32)
                logits, cache = D.decode_step(model, jnp.asarray(steps[step]),
                                              cache, bt, pos)
                outs.append(logits)
            return outs

        exact = run(None, None, None)
        per_head = run(ks, vs, 4)
        collapsed = run(ks_c, vs_c, 4)
        err_ph = sum(float(jnp.mean(jnp.abs(a - b)))
                     for a, b in zip(exact, per_head))
        err_c = sum(float(jnp.mean(jnp.abs(a - b)))
                    for a, b in zip(exact, collapsed))
        # per-head scales can only refine the grid; allow float fuzz
        assert err_ph <= err_c * 1.05, (err_ph, err_c)

    def test_int4_paged_pack_roundtrip(self):
        """pack_int4_rows_adj/unpack_int4_rows_adj invert each other and
        place head 2p in the low nibble."""
        from gptq_v2_tpu.serving.kv_cache import (pack_int4_rows_adj,
                                                  unpack_int4_rows_adj)

        rng = np.random.default_rng(7)
        q4 = jnp.asarray(rng.integers(-7, 8, (3, 5, 6, 8)), jnp.int32)
        p8 = pack_int4_rows_adj(q4)
        assert p8.shape == (3, 5, 3, 8) and p8.dtype == jnp.int8
        assert np.array_equal(np.asarray(unpack_int4_rows_adj(p8)),
                              np.asarray(q4))

    def test_ragged_scheduler_matches_phased(self, packed_model):
        """Chunked-prefill (ragged) scheduling must produce the same greedy
        outputs as the phased prefill-then-decode loop — prompts longer
        than the token budget force multi-tick chunking, and staggered
        lengths force mixed prefill+decode ticks."""
        model, _ = packed_model
        rng = np.random.default_rng(21)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (23, 5, 11)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=6)
                        for i, p in enumerate(prompts)]
        eng_p = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                       cache_kind="paged")
        out_p = eng_p.run(reqs())
        eng_r = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                       cache_kind="paged", scheduler="ragged", token_budget=8)
        out_r = eng_r.run(reqs())
        for uid in out_p:
            assert out_r[uid] == out_p[uid], (uid, out_r[uid], out_p[uid])

    def test_ragged_scheduler_int8_kv(self, packed_model):
        """Ragged scheduling composes with int8 KV storage."""
        model, _ = packed_model
        rng = np.random.default_rng(22)
        prompt = rng.integers(0, model.cfg.vocab_size, (9,)).tolist()
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", token_budget=8,
                     kv_dtype="int8")
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=4)])
        assert len(out[0]) == 4

    def test_int8_kv_engine_end_to_end(self, packed_model):
        """Engine integration: int8 KV engine runs and produces the right
        number of tokens with auto-calibrated scales."""
        model, _ = packed_model
        rng = np.random.default_rng(13)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", kv_dtype="int8")
        assert eng.cache.kv_storage_dtype == jnp.int8
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert len(out[0]) == 5

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_continuous_batching_matches_sequential(self, packed_model, kind):
        model, _ = packed_model
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (5, 9, 3)]
        expected = [greedy_full_recompute(model, p, 5) for p in prompts]
        # batched together: slots shared, different lengths
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind)
        reqs = [Request(uid=i, prompt=p, max_new_tokens=5)
                for i, p in enumerate(prompts)]
        out = eng.run(reqs)
        for i in range(3):
            assert out[i] == expected[i], f"request {i}"

    def test_page_reuse(self, packed_model):
        model, _ = packed_model
        eng = Engine(model, max_batch=1, page_size=8, max_seq_len=32,
                     cache_kind="paged")
        total_pages = len(eng.free_pages)
        rng = np.random.default_rng(6)
        for uid in range(3):
            prompt = rng.integers(0, model.cfg.vocab_size, (4,)).tolist()
            eng.run([Request(uid=uid, prompt=prompt, max_new_tokens=4)])
        assert len(eng.free_pages) == total_pages  # all pages returned

    def test_slot_reuse_contiguous(self, packed_model):
        """A freed slot serves a new request without stale-KV leakage."""
        model, _ = packed_model
        rng = np.random.default_rng(8)
        eng = Engine(model, max_batch=1, page_size=8, max_seq_len=32)
        p1 = rng.integers(0, model.cfg.vocab_size, (9,)).tolist()
        p2 = rng.integers(0, model.cfg.vocab_size, (4,)).tolist()
        eng.run([Request(uid=0, prompt=p1, max_new_tokens=4)])
        out = eng.run([Request(uid=1, prompt=p2, max_new_tokens=5)])
        assert out[1] == greedy_full_recompute(model, p2, 5)

    def test_speculative_engine_matches_plain_engine(self, packed_model):
        """Engine(draft=...) — speculation inside continuous batching.
        Greedy outputs must be token-identical to the non-speculative
        engine for every request, across slot reuse (5 requests through 2
        slots, mixed prompt/output lengths)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        model, _ = packed_model
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=71,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(72)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (5, 9, 3, 7, 4)]
        lens = [6, 3, 5, 4, 6]

        def reqs():
            return [Request(uid=i, prompt=p, max_new_tokens=n)
                    for i, (p, n) in enumerate(zip(prompts, lens))]

        want = Engine(model, max_batch=2, max_seq_len=64).run(reqs())
        eng = Engine(model, max_batch=2, max_seq_len=64, draft=draft,
                     spec_k=3)
        got = eng.run(reqs())
        assert got == want
        assert eng.spec_proposed > 0
        assert 0 <= eng.spec_accepted <= eng.spec_proposed

    def test_speculative_engine_self_draft_fewer_steps(self, packed_model):
        """draft == target accepts every greedy proposal: the engine must
        finish in far fewer ticks than token-by-token decode."""
        model, _ = packed_model
        rng = np.random.default_rng(73)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        want = Engine(model, max_batch=1, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])
        eng = Engine(model, max_batch=1, max_seq_len=64, draft=model,
                     spec_k=3)
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert got == want
        # 8 tokens: 1 from prefill + 7 via ticks of up to 4 emits => <= 3
        assert eng.spec_rounds <= 3
        assert eng.spec_accepted == eng.spec_proposed  # all accepted

    def test_speculative_engine_eos_mid_chunk(self, packed_model):
        """An EOS accepted mid-chunk stops the request there and frees the
        slot; output matches the non-speculative engine under the same
        eos_token_id."""
        model, _ = packed_model
        rng = np.random.default_rng(74)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        base = Engine(model, max_batch=1, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])[0]
        eos = base[len(base) // 2]  # a token greedy decode really emits
        want = Engine(model, max_batch=1, max_seq_len=64,
                      eos_token_id=eos).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])
        eng = Engine(model, max_batch=1, max_seq_len=64, draft=model,
                     spec_k=3, eos_token_id=eos)
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert got == want

    def test_speculative_warped_self_draft_accepts_everything(
            self, packed_model):
        """Warped (top-k/top-p/min-p) speculative sampling: with draft ==
        target and identical warps on both sides, p_d == p_t so EVERY
        proposal is accepted — a warp asymmetry between the draft sampler
        and the acceptance rule would reject often."""
        model, _ = packed_model
        rng = np.random.default_rng(85)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        eng = Engine(model, max_batch=1, max_seq_len=64, draft=model,
                     spec_k=3, seed=9)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8,
                               temperature=0.9, top_k=8, top_p=0.9)])
        assert len(out[0]) == 8
        assert eng.spec_accepted == eng.spec_proposed  # all accepted

    def test_speculative_warped_greedy_rows_unchanged(self, packed_model):
        """A mixed batch (greedy + warped-sampled) through the speculative
        engine: the greedy request's output is still token-identical to
        the plain engine (warps never perturb argmax rows)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        model, _ = packed_model
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=86,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(87)
        p_greedy = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        p_warp = rng.integers(0, model.cfg.vocab_size, (4,)).tolist()
        want = Engine(model, max_batch=2, max_seq_len=64).run(
            [Request(uid=0, prompt=p_greedy, max_new_tokens=6)])[0]
        eng = Engine(model, max_batch=2, max_seq_len=64, draft=draft,
                     spec_k=3)
        got = eng.run([
            Request(uid=0, prompt=p_greedy, max_new_tokens=6),
            Request(uid=1, prompt=p_warp, max_new_tokens=6,
                    temperature=0.8, top_k=8),
        ])
        assert got[0] == want
        assert len(got[1]) == 6

    def test_speculative_logprobs_match_plain_engine(self, packed_model):
        """Engine(draft=..., logprobs=True): every emitted token records
        its raw-distribution logprob; greedy self-draft emits the same
        tokens as the plain engine, so the logprobs must match its too."""
        model, _ = packed_model
        rng = np.random.default_rng(88)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()

        def run(eng):
            req = Request(uid=0, prompt=prompt, max_new_tokens=6)
            eng.add_request(req)
            while eng.queue or any(s is not None for s in eng.slots):
                eng.step()
            return req
        plain = run(Engine(model, max_batch=1, max_seq_len=64,
                           logprobs=True))
        spec = run(Engine(model, max_batch=1, max_seq_len=64, draft=model,
                          spec_k=3, logprobs=True))
        assert spec.output == plain.output
        assert len(spec.logprobs) == len(spec.output)
        np.testing.assert_allclose(spec.logprobs, plain.logprobs,
                                   rtol=0, atol=5e-3)

    def test_speculative_engine_int8_kv(self, packed_model):
        """Speculation over an int8 target cache matches the plain engine
        on the same int8 cache (identical write/read quantization)."""
        model, _ = packed_model
        rng = np.random.default_rng(75)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (5, 7)]

        def reqs():
            return [Request(uid=i, prompt=p, max_new_tokens=4)
                    for i, p in enumerate(prompts)]

        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        scales = calibrate_kv_scales(model)
        want = Engine(model, max_batch=2, max_seq_len=64, kv_dtype="int8",
                      kv_scales=scales).run(reqs())
        got = Engine(model, max_batch=2, max_seq_len=64, kv_dtype="int8",
                     kv_scales=scales, draft=model, spec_k=2).run(reqs())
        assert got == want

    def test_packed_lm_head(self, packed_model):
        """Opt-in INT4 lm_head: forward matches dense RTN-dequant; serving
        and TP paths run with it."""
        from gptq_v2_tpu.ops.packing import dequantize_dense, rtn_pack_dense
        from gptq_v2_tpu.serving.model import (PackedLlama,
                                               packed_forward_logits)

        model, _ = packed_model
        lm_packed = rtn_pack_dense(np.asarray(model.lm_head), 16, jnp.float32)
        model_q = PackedLlama(model.cfg, model.embed_tokens, model.layers,
                              model.norm, lm_packed)
        rng = np.random.default_rng(13)
        tokens = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (2, 8)))
        got = packed_forward_logits(model_q, tokens)
        dense_lm = dequantize_dense(lm_packed, jnp.float32)
        ref_model = PackedLlama(model.cfg, model.embed_tokens, model.layers,
                                model.norm, dense_lm)
        want = packed_forward_logits(ref_model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=5e-3 * scale)
        # engine end-to-end with the packed head
        eng = Engine(model_q, max_batch=1, page_size=8, max_seq_len=32)
        prompt = rng.integers(0, model.cfg.vocab_size, (4,)).tolist()
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=3)])
        assert len(out[0]) == 3

    def test_paged_attention_reference_matches_dense(self):
        """The paged-attention jnp twin (the kernel's oracle) == dense masked
        GQA attention over the gathered K/V."""
        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.ops.paged_attention import (
            paged_decode_attention_reference,
        )
        from gptq_v2_tpu.serving import kv_cache as kvc

        rng = np.random.default_rng(11)
        b, ps, mp, n_kv, hq, hd = 3, 8, 4, 2, 4, 16
        npool = 1 + b * mp
        cache = kvc.init_cache(1, npool, ps, n_kv, hd, dtype=jnp.float32)
        cache = cache._replace(
            kv=jnp.asarray(rng.standard_normal(cache.kv.shape), jnp.float32))
        bt = jnp.asarray(
            rng.permutation(npool - 1)[:b * mp].reshape(b, mp).astype(np.int32) + 1)
        lengths = jnp.asarray([5, mp * ps, 17], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, hq, hd)), jnp.float32)

        out = paged_decode_attention_reference(q, cache.kv[0], lengths, bt)
        k_all, v_all = kvc.gather_kv(cache, 0, bt)
        mask = jnp.arange(mp * ps)[None, :] < lengths[:, None]
        ref = L.attention(q[:, None], k_all, v_all, causal_offset=None,
                          key_mask=mask)[:, 0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_write_kv_roundtrip_and_pad_steering(self):
        """write_kv places tokens at (page, offset) per the block table;
        pad-masked tokens land in the trash page."""
        from gptq_v2_tpu.serving import kv_cache as kvc

        rng = np.random.default_rng(3)
        b, n, ps, mp, n_kv, hd = 2, 5, 4, 3, 2, 8
        cache = kvc.init_cache(1, 1 + b * mp, ps, n_kv, hd, dtype=jnp.float32)
        bt = jnp.asarray(1 + np.arange(b * mp).reshape(b, mp), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        pad = pos >= jnp.asarray([[4], [2]])  # row lengths 4 and 2
        k_new = jnp.asarray(rng.standard_normal((b, n, n_kv, hd)), jnp.float32)
        cache = kvc.write_kv(cache, 0, k_new, k_new, bt, pos, pad_mask=pad)
        k_all, _ = kvc.gather_kv(cache, 0, bt)
        for row, L_ in ((0, 4), (1, 2)):
            np.testing.assert_array_equal(np.asarray(k_all[row, :L_]),
                                          np.asarray(k_new[row, :L_]))
            # padded positions were steered away: cache region stays zero
            np.testing.assert_array_equal(np.asarray(k_all[row, L_:n]), 0.0)

    def test_decode_multi_matches_stepwise(self, packed_model):
        """One scanned burst == n repeated decode_step calls (greedy)."""
        from gptq_v2_tpu.serving import decode as D
        from gptq_v2_tpu.serving import kv_cache as kvc

        model, _ = packed_model
        cfg = model.cfg
        rng = np.random.default_rng(9)
        prompt = rng.integers(0, cfg.vocab_size, (6,)).tolist()

        def mk():
            c = kvc.init_contiguous_cache(cfg.num_hidden_layers, 1, 32,
                                          cfg.num_key_value_heads,
                                          cfg.head_dim_, dtype=jnp.float32)
            tokens = jnp.asarray([prompt], jnp.int32)
            logits, c = D.prefill(model, tokens, c, None,
                                  jnp.asarray([len(prompt)], np.int32),
                                  slot=jnp.asarray([0], np.int32))
            return c, jnp.argmax(logits, -1).astype(jnp.int32)

        n = 5
        cache, tok = mk()
        toks_multi, _, _ = D.decode_multi(
            model, tok, cache, None, jnp.asarray([len(prompt)], np.int32), n)
        cache, tok = mk()
        got = []
        for i in range(n):
            logits, cache = D.decode_step(
                model, tok, cache, None,
                jnp.asarray([len(prompt) + i], np.int32))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            got.append(int(tok[0]))
        assert np.asarray(toks_multi)[:, 0].tolist() == got

    def test_sampling_temperature(self, packed_model):
        model, _ = packed_model
        from gptq_v2_tpu.serving.decode import sample

        logits = jnp.asarray(np.random.default_rng(7).standard_normal((4, 32)),
                             dtype=jnp.float32)
        g = sample(logits, jax.random.key(0), temperature=0.0)
        np.testing.assert_array_equal(np.asarray(g), np.argmax(np.asarray(logits), -1))
        s1 = sample(logits, jax.random.key(1), temperature=1.0, top_k=5)
        assert s1.shape == (4,)

    def test_mixed_temperature_batch_keeps_greedy_rows_greedy(self, packed_model):
        """A greedy request batched with sampling requests must still
        argmax — per-row temperatures, not a shared fallback."""
        model, _ = packed_model
        rng = np.random.default_rng(12)
        prompt_g = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        prompt_s = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        expected = greedy_full_recompute(model, prompt_g, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64)
        out = eng.run([
            Request(uid=0, prompt=prompt_g, max_new_tokens=5, temperature=0.0),
            Request(uid=1, prompt=prompt_s, max_new_tokens=5, temperature=1.0),
        ])
        assert out[0] == expected


class TestTopKTopP:
    """Per-request top-k / nucleus sampling (`Request.top_k` / `top_p`)."""

    def _draws(self, logits, temps, n=48, **kw):
        from gptq_v2_tpu.serving.decode import sample_per_row

        return np.stack([
            np.asarray(sample_per_row(logits, jax.random.key(s),
                                      temps, **kw))
            for s in range(n)
        ])  # (n, B)

    def test_per_row_support_restriction(self):
        """top_k=1 / tiny top_p force argmax even at high temperature;
        top_k=3 restricts draws to the 3 highest logits; disabled rows
        sample the full vocabulary (checked: they reach tokens outside
        any small support)."""
        rng = np.random.default_rng(40)
        logits = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        temps = jnp.full((4,), 5.0, jnp.float32)  # hot: near-uniform
        top_ks = jnp.asarray([1, 3, 0, 0], jnp.int32)
        top_ps = jnp.asarray([1.0, 1.0, 1e-6, 1.0], jnp.float32)
        draws = self._draws(logits, temps, top_ks=top_ks, top_ps=top_ps)
        order = np.argsort(-np.asarray(logits), axis=-1)
        assert set(draws[:, 0]) == {order[0, 0]}  # top_k=1 == argmax
        assert set(draws[:, 1]) <= set(order[1, :3])  # within top-3
        assert len(set(draws[:, 1])) > 1  # ...and actually samples
        assert set(draws[:, 2]) == {order[2, 0]}  # top_p→0 == argmax
        assert len(set(draws[:, 3])) > 5  # unrestricted row roams

    def test_nucleus_mass_cutoff(self):
        """top_p keeps exactly the smallest prefix reaching the mass: with
        p(top1)≈0.73, top_p=0.5 keeps only token 0; top_p=0.9 keeps
        tokens {0,1}."""
        logits = jnp.asarray([[10.0, 9.0] + [-10.0] * 14] * 2, jnp.float32)
        temps = jnp.ones((2,), jnp.float32)
        top_ps = jnp.asarray([0.5, 0.9], jnp.float32)
        draws = self._draws(logits, temps, top_ps=top_ps)
        assert set(draws[:, 0]) == {0}
        assert set(draws[:, 1]) == {0, 1}
        assert 1 in draws[:, 1]  # the second nucleus token is reachable

    def test_disabled_rows_match_plain_path(self):
        """top_ks=0 / top_ps=1 rows draw the SAME tokens as the unwarped
        program under the same key (the warp is an exact no-op, not just
        distribution-preserving)."""
        from gptq_v2_tpu.serving.decode import sample_per_row

        rng = np.random.default_rng(41)
        logits = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
        temps = jnp.asarray([0.0, 0.7, 1.3], jnp.float32)
        for s in range(8):
            key = jax.random.key(s)
            plain = sample_per_row(logits, key, temps)
            warped = sample_per_row(
                logits, key, temps,
                top_ks=jnp.zeros((3,), jnp.int32),
                top_ps=jnp.ones((3,), jnp.float32))
            np.testing.assert_array_equal(np.asarray(plain),
                                          np.asarray(warped))

    @pytest.mark.parametrize("scheduler,kind", [("phased", "contiguous"),
                                                ("ragged", "paged")])
    def test_engine_top_k1_equals_greedy(self, packed_model, scheduler, kind):
        """A hot-temperature request with top_k=1 must reproduce the greedy
        engine's output exactly, on both schedulers, batched next to an
        unrestricted sampling request."""
        model, _ = packed_model
        rng = np.random.default_rng(42)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        other = rng.integers(0, model.cfg.vocab_size, (9,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind=kind, scheduler=scheduler)
        out = eng.run([
            Request(uid=0, prompt=prompt, max_new_tokens=5,
                    temperature=4.0, top_k=1),
            Request(uid=1, prompt=other, max_new_tokens=5,
                    temperature=1.0, top_p=0.8),
        ])
        assert out[0] == expected
        assert len(out[1]) == 5

    def test_speculative_engine_accepts_topk(self, packed_model):
        """Warped sampling (top-k/top-p/min-p) is supported on the
        speculative engine since the warped-acceptance rule landed;
        positive behavior is covered by
        ``test_speculative_warped_self_draft_accepts_everything`` — here
        just assert admission no longer raises."""
        model, _ = packed_model
        eng = Engine(model, max_batch=1, max_seq_len=64, draft=model,
                     spec_k=2)
        eng.add_request(Request(uid=0, prompt=[1, 2], max_new_tokens=2,
                                top_k=5))
        assert len(eng.queue) == 1

    def test_mla_absorbed_topk1_equals_greedy(self):
        """Round-5: warped sampling composes with MLA-absorbed decode —
        top_k=1 at high temperature must reproduce the greedy output
        (the same invariant the other engine modes assert)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=55,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(57)
        prompt = rng.integers(0, cfg.vocab_size, (6,)).tolist()
        want = Engine(model, max_batch=1, max_seq_len=64,
                      mla_absorbed=True).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        got = Engine(model, max_batch=1, max_seq_len=64,
                     mla_absorbed=True).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5,
                     temperature=4.0, top_k=1)])
        assert got == want


class TestPrefixCache:
    """Hash-chained shared-prefix KV reuse on the paged cache + ragged
    scheduler (`Engine(prefix_cache=True)`)."""

    def _mk(self, model, prefix_cache, n_pages=None):
        return Engine(model, max_batch=1, page_size=8, max_seq_len=64,
                      cache_kind="paged", scheduler="ragged",
                      n_pages=n_pages, prefix_cache=prefix_cache)

    def test_repeat_prompt_reuses_pages(self, packed_model):
        """A prompt served twice on one engine: the second admission links
        the cached full prefix pages (hit tokens > 0) and produces the
        same greedy output as an uncached engine."""
        model, _ = packed_model
        rng = np.random.default_rng(50)
        prompt = rng.integers(0, model.cfg.vocab_size, (21,)).tolist()
        want = self._mk(model, False).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])[0]
        eng = self._mk(model, True)
        first = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])[0]
        assert eng.prefix_hit_tokens == 0
        second = eng.run([Request(uid=1, prompt=prompt, max_new_tokens=5)])[1]
        assert first == want and second == want
        # 21 tokens / page 8 -> 2 full pages = 16 reused tokens
        assert eng.prefix_hit_tokens == 16

    def test_shared_prefix_different_tails(self, packed_model):
        """Requests sharing a long prefix but diverging afterwards: each
        output matches the uncached engine; later admissions hit the
        shared pages only up to the divergence point."""
        model, _ = packed_model
        rng = np.random.default_rng(51)
        prefix = rng.integers(0, model.cfg.vocab_size, (17,)).tolist()
        tails = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                 for n in (6, 3, 9)]
        reqs = lambda: [Request(uid=i, prompt=prefix + t, max_new_tokens=4)
                        for i, t in enumerate(tails)]
        want = self._mk(model, False).run(reqs())
        eng = self._mk(model, True)
        got = eng.run(reqs())
        assert got == want
        # 17-token prefix -> 2 full shared pages x 2 later requests
        assert eng.prefix_hit_tokens == 32

    def test_eviction_keeps_engine_correct(self, packed_model):
        """A pool too small to cache everything forces LRU eviction of
        finished prefixes; admission falls back to recompute and outputs
        stay correct."""
        model, _ = packed_model
        rng = np.random.default_rng(52)
        prompts = [rng.integers(0, model.cfg.vocab_size, (19,)).tolist()
                   for _ in range(4)]
        # 1 trash + 9 pages; each request needs ceil((19+4)/8)=3 pages
        eng = self._mk(model, True, n_pages=10)
        ref = self._mk(model, False, n_pages=10)
        for rep in range(2):
            for i, p in enumerate(prompts):
                want = ref.run([Request(uid=0, prompt=p,
                                        max_new_tokens=4)])[0]
                got = eng.run([Request(uid=0, prompt=p,
                                       max_new_tokens=4)])[0]
                assert got == want, (rep, i)
        # page accounting stays consistent: every non-trash page is
        # either free or cached-with-rc-0 once all requests finished
        cached = set(eng._cached_free)
        assert cached.isdisjoint(eng.free_pages)
        assert len(cached) + len(eng.free_pages) == 9
        assert all(eng._page_rc[p] == 0 for p in cached)

    def test_page_boundary_prompt_leaves_one_token(self, packed_model):
        """A prompt of exactly N full pages may only reuse N-1 pages (the
        last token must be recomputed so its logits exist and shared
        pages are never written)."""
        model, _ = packed_model
        rng = np.random.default_rng(53)
        prompt = rng.integers(0, model.cfg.vocab_size, (16,)).tolist()
        want = self._mk(model, False).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=4)])[0]
        eng = self._mk(model, True)
        eng.run([Request(uid=0, prompt=prompt, max_new_tokens=4)])
        got = eng.run([Request(uid=1, prompt=prompt, max_new_tokens=4)])[1]
        assert got == want
        assert eng.prefix_hit_tokens == 8  # 1 of 2 full pages


class TestMinPAndStopTokens:
    def test_min_p_support(self):
        """min_p keeps tokens whose probability is >= min_p x p(max):
        with logits [5, 4.9, -5...] at temp 1, p1/p0 = e^-0.1 ≈ 0.90 — so
        min_p=0.5 keeps {0,1}, min_p=0.95 keeps only {0}; a disabled row
        roams the full support."""
        from gptq_v2_tpu.serving.decode import sample_per_row

        logits = jnp.asarray([[5.0, 4.9] + [-5.0] * 14] * 3, jnp.float32)
        # row 2 is hot (temp 5) so its unrestricted draws reach the tail
        temps = jnp.asarray([1.0, 1.0, 5.0], jnp.float32)
        mps = jnp.asarray([0.5, 0.95, 0.0], jnp.float32)
        draws = np.stack([
            np.asarray(sample_per_row(logits, jax.random.key(s), temps,
                                      min_ps=mps)) for s in range(64)])
        assert set(draws[:, 0]) == {0, 1}
        assert set(draws[:, 1]) == {0}
        assert len(set(draws[:, 2])) > 2

    def test_min_p_disabled_rows_bit_exact(self):
        from gptq_v2_tpu.serving.decode import sample_per_row

        rng = np.random.default_rng(60)
        logits = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
        temps = jnp.asarray([0.8, 1.2], jnp.float32)
        for s in range(6):
            key = jax.random.key(s)
            np.testing.assert_array_equal(
                np.asarray(sample_per_row(logits, key, temps)),
                np.asarray(sample_per_row(
                    logits, key, temps, min_ps=jnp.zeros((2,), jnp.float32))))

    def test_stop_token_ids(self, packed_model):
        """A token in Request.stop_token_ids ends the request exactly like
        the engine-wide eos_token_id does (token included, slot freed),
        without affecting other requests in the batch."""
        model, _ = packed_model
        rng = np.random.default_rng(61)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        other = rng.integers(0, model.cfg.vocab_size, (4,)).tolist()
        base = Engine(model, max_batch=2, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])[0]
        stop = base[len(base) // 2]  # a token greedy decode really emits
        want = Engine(model, max_batch=2, max_seq_len=64,
                      eos_token_id=stop).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])[0]
        out = Engine(model, max_batch=2, max_seq_len=64).run([
            Request(uid=0, prompt=prompt, max_new_tokens=8,
                    stop_token_ids=[stop, model.cfg.vocab_size - 1]),
            Request(uid=1, prompt=other, max_new_tokens=8),
        ])
        assert out[0] == want
        assert len(out[1]) == 8  # the stop set is per-request

    def test_stop_token_ids_speculative(self, packed_model):
        """Per-request stops compose with the speculative engine (a stop
        accepted mid-chunk truncates there)."""
        model, _ = packed_model
        rng = np.random.default_rng(62)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        base = Engine(model, max_batch=1, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])[0]
        stop = base[len(base) // 2]
        want = Engine(model, max_batch=1, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8,
                     stop_token_ids=[stop])])[0]
        got = Engine(model, max_batch=1, max_seq_len=64, draft=model,
                     spec_k=3).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8,
                     stop_token_ids=[stop])])[0]
        assert got == want == base[:base.index(stop) + 1]


class TestLogprobs:
    def _oracle_logprobs(self, model, prompt, output):
        """log p(tok) from full-forward log-softmax at each emitted step."""
        toks, out = list(prompt), []
        for t in output:
            logits = packed_forward_logits(model, jnp.asarray([toks]))
            lsm = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
            out.append(float(lsm[t]))
            toks.append(t)
        return out

    @pytest.mark.parametrize("scheduler,kind", [("phased", "contiguous"),
                                                ("ragged", "paged")])
    def test_logprobs_match_full_forward(self, packed_model, scheduler, kind):
        """Engine(logprobs=True): per-token raw-distribution logprobs match
        a full-forward log-softmax oracle, outputs are unchanged vs the
        non-logprobs engine, lists align 1:1 with outputs."""
        model, _ = packed_model
        rng = np.random.default_rng(80)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 9)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        kw = dict(cache_kind=kind, scheduler=scheduler, page_size=8)
        want = Engine(model, max_batch=2, max_seq_len=64, **kw).run(reqs())
        rs = reqs()
        got = Engine(model, max_batch=2, max_seq_len=64, logprobs=True,
                     **kw).run(rs)
        assert got == want  # the flag must not perturb sampling
        for r in rs:
            assert len(r.logprobs) == len(r.output)
            assert all(lp <= 0.0 for lp in r.logprobs)
            oracle = self._oracle_logprobs(model, r.prompt, r.output)
            np.testing.assert_allclose(r.logprobs, oracle, atol=2e-3)

    def test_logprobs_sampled_are_raw_distribution(self, packed_model):
        """A hot-temperature sampled request still records RAW-distribution
        logprobs (independent of temperature/warping)."""
        model, _ = packed_model
        rng = np.random.default_rng(81)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        r = Request(uid=0, prompt=prompt, max_new_tokens=4, temperature=2.0,
                    top_k=8)
        Engine(model, max_batch=1, max_seq_len=64, logprobs=True).run([r])
        oracle = self._oracle_logprobs(model, prompt, r.output)
        np.testing.assert_allclose(r.logprobs, oracle, atol=2e-3)


class TestRaggedSpecEngine:
    """Speculation on the ragged scheduler: draft proposals verified inside
    the mixed chunked-prefill dispatch over the paged cache."""

    def _draft(self, seed=91):
        from gptq_v2_tpu.serving.model import random_packed_llama

        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        return random_packed_llama(dcfg, group_size=16, seed=seed,
                                   compute_dtype=jnp.float32)

    def _mk(self, model, draft=None, **kw):
        return Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                      cache_kind="paged", scheduler="ragged",
                      token_budget=16, draft=draft, spec_k=3, **kw)

    def test_matches_plain_ragged_engine(self, packed_model):
        """Greedy outputs across slot reuse (5 requests through 2 slots,
        prompts longer than the token budget force multi-tick chunking)
        must equal the non-speculative ragged engine."""
        model, _ = packed_model
        rng = np.random.default_rng(90)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (21, 5, 11, 3, 7)]
        lens = [6, 4, 5, 6, 3]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=n)
                        for i, (p, n) in enumerate(zip(prompts, lens))]
        want = self._mk(model).run(reqs())
        eng = self._mk(model, draft=self._draft())
        got = eng.run(reqs())
        assert got == want
        assert eng.spec_proposed > 0
        assert 0 <= eng.spec_accepted <= eng.spec_proposed

    def test_int4_kv_composes_with_speculation(self, packed_model):
        """int4 KV × speculation (round-5: the round-4 exclusion dropped):
        the spec engine's ragged verify runs on int4 pages (per-head
        scales folded outside the kernel) and its greedy outputs equal the
        plain ragged int4 engine's."""
        model, _ = packed_model
        rng = np.random.default_rng(95)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (21, 5, 11)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = self._mk(model, kv_dtype="int4").run(reqs())
        eng = self._mk(model, draft=self._draft(), kv_dtype="int4")
        assert eng.cache.kv_bits == 4
        got = eng.run(reqs())
        assert got == want
        assert eng.spec_proposed > 0

    def test_self_draft_fewer_ticks(self, packed_model):
        """draft == target accepts everything: far fewer spec rounds than
        token-by-token decode."""
        model, _ = packed_model
        rng = np.random.default_rng(92)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        want = self._mk(model).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=9)])
        eng = self._mk(model, draft=model)
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=9)])
        assert got == want
        assert eng.spec_accepted == eng.spec_proposed  # all accepted
        # 9 tokens: 1 at prefill + 8 via rounds of up to 4 emits => <= 2
        assert eng.spec_rounds <= 2

    def test_composes_with_prefix_cache(self, packed_model):
        """Speculation + prefix caching together: the second identical
        prompt links cached pages AND speculates; output unchanged."""
        model, _ = packed_model
        rng = np.random.default_rng(93)
        prompt = rng.integers(0, model.cfg.vocab_size, (21,)).tolist()
        want = self._mk(model).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])[0]
        eng = self._mk(model, draft=self._draft(94), prefix_cache=True)
        first = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])[0]
        second = eng.run([Request(uid=1, prompt=prompt, max_new_tokens=5)])[1]
        assert first == want and second == want
        assert eng.prefix_hit_tokens == 16  # 2 of 21//8 full pages

    def test_eos_mid_chunk(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(95)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        base = self._mk(model).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])[0]
        eos = base[len(base) // 2]
        want = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                      cache_kind="paged", scheduler="ragged",
                      eos_token_id=eos).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", draft=model,
                     spec_k=3, eos_token_id=eos)
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert got == want

    def test_warped_self_draft_accepts_everything(self, packed_model):
        """Warped sampling on the ragged spec path: identical warps on the
        draft sampler and the fused acceptance rule → self-draft accepts
        every proposal."""
        model, _ = packed_model
        rng = np.random.default_rng(96)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        eng = self._mk(model, draft=model, seed=4)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8,
                               temperature=0.9, top_k=8, top_p=0.9)])
        assert len(out[0]) == 8
        assert eng.spec_accepted == eng.spec_proposed

    def test_logprobs_match_plain_ragged(self, packed_model):
        """Ragged spec + logprobs: greedy self-draft emits the plain
        ragged engine's tokens with matching raw-distribution logprobs
        (incl. the prefill-completion first token)."""
        model, _ = packed_model
        rng = np.random.default_rng(97)
        prompt = rng.integers(0, model.cfg.vocab_size, (11,)).tolist()

        def run(eng):
            req = Request(uid=0, prompt=prompt, max_new_tokens=6)
            eng.add_request(req)
            while eng.queue or any(s is not None for s in eng.slots):
                eng.step()
            return req
        plain = run(self._mk(model, logprobs=True))
        spec = run(self._mk(model, draft=model, logprobs=True))
        assert spec.output == plain.output
        assert len(spec.logprobs) == len(spec.output)
        np.testing.assert_allclose(spec.logprobs, plain.logprobs,
                                   rtol=0, atol=5e-3)


class TestW8A16:
    def test_w8a16_packed_serving(self):
        """8-bit GPTQ output serves through the same fused kernel (4 byte
        planes per word): packed forward matches the dense dequant, engine
        decode matches the full recompute, and accuracy beats 4-bit."""
        cfg = L.LlamaConfig.tiny(dtype="float32")
        params = L.init_params(cfg, jax.random.key(3))
        rng = np.random.default_rng(5)
        calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
        pq = {k: (list(map(dict, v)) if k == "layers" else v)
              for k, v in params.items()}
        r8 = quantize_model(cfg, pq, calib, QuantConfig(bits=8, group_size=16),
                            batch_size=4)
        model = quantize_params_to_packed(cfg, pq, r8["data"],
                                          compute_dtype=jnp.float32)
        p0 = model.layers[0]["self_attn.q_proj"]
        assert p0.bits == 8 and p0.planes == 4
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        packed = packed_forward_logits(model, tokens)
        dense = L.forward_logits(cfg, dequantized_params(model, jnp.float32),
                                 tokens)
        scale = float(jnp.abs(dense).max())
        np.testing.assert_allclose(np.asarray(packed), np.asarray(dense),
                                   rtol=0, atol=5e-3 * scale)
        prompt = rng.integers(0, cfg.vocab_size, (7,)).tolist()
        expected = greedy_full_recompute(model, prompt, 5)
        out = Engine(model, max_batch=2, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected


class TestMLAAbsorbed:
    """DeepSeek absorbed decode: the compressed-latent cache path."""

    def _model(self):
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        return random_packed_llama(cfg, group_size=16, seed=55,
                                   compute_dtype=jnp.float32)

    def test_matches_naive_engine(self):
        """Absorbed decode over the latent cache produces the same greedy
        outputs as the naive padded-KV engine across slot reuse."""
        model = self._model()
        rng = np.random.default_rng(56)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 9, 4)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=64).run(reqs())
        eng = Engine(model, max_batch=2, max_seq_len=64, mla_absorbed=True)
        got = eng.run(reqs())
        assert got == want
        # the cache really is the compressed latent: one shared row of
        # kv_lora + rope_dim per token, no per-head K/V
        assert eng.cache.lat.shape == (2, 2, 64, 40)

    def test_logprobs_match_naive_engine(self):
        """Round-5: logprobs compose with MLA-absorbed decode.  The
        absorbed engine's per-token raw-distribution logprobs match the
        naive engine's (itself checked against a full forward in
        TestLogprobs) to float tolerance."""
        model = self._model()
        rng = np.random.default_rng(58)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()
        r_naive = Request(uid=0, prompt=prompt, max_new_tokens=5)
        Engine(model, max_batch=1, max_seq_len=64,
               logprobs=True).run([r_naive])
        r_abs = Request(uid=0, prompt=prompt, max_new_tokens=5)
        Engine(model, max_batch=1, max_seq_len=64, logprobs=True,
               mla_absorbed=True).run([r_abs])
        assert r_abs.output == r_naive.output
        assert len(r_abs.logprobs) == 5
        np.testing.assert_allclose(r_abs.logprobs, r_naive.logprobs,
                                   rtol=1e-4, atol=1e-5)

    def test_multi_step_matches_single_step(self):
        """Round-5: multi-step fori ticks compose with MLA-absorbed decode
        (``mla.mla_decode_sample_loop``) — token-identical to the
        single-step absorbed engine, logprobs riding along."""
        model = self._model()
        rng = np.random.default_rng(59)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 9)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=6)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=64,
                      mla_absorbed=True).run(reqs())
        eng = Engine(model, max_batch=2, max_seq_len=64, mla_absorbed=True,
                     multi_step=3, logprobs=True)
        rs = reqs()
        got = eng.run(rs)
        assert got == want
        assert all(len(r.logprobs) == 6 for r in rs)

    def test_ragged_scheduler_matches_phased(self):
        """Round-5: MLA-absorbed composes with the ragged scheduler — the
        paged latent cache + chunked prefill (mla.mla_ragged_step)
        produces the same greedy outputs as the phased absorbed engine
        (prompts longer than the token budget force multi-tick
        chunking; slot reuse via 3 requests through 2 slots)."""
        model = self._model()
        rng = np.random.default_rng(61)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (21, 5, 11)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=64,
                      mla_absorbed=True).run(reqs())
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", token_budget=8,
                     mla_absorbed=True)
        got = eng.run(reqs())
        assert got == want
        # the paged cache really is the compressed latent
        assert eng.cache.lat.ndim == 4 and eng.cache.lat.shape[-1] == 40

    def test_ragged_int8_latent_and_logprobs(self):
        """MLA-ragged with the int8 latent tier + logprobs + warped
        sampling: serves end-to-end; greedy rows match the full-precision
        ragged engine's outputs closely (int8 latent quantization)."""
        model = self._model()
        rng = np.random.default_rng(62)
        prompt = rng.integers(0, model.cfg.vocab_size, (9,)).tolist()

        def mk(**kw):
            return Engine(model, max_batch=1, page_size=8, max_seq_len=64,
                          cache_kind="paged", scheduler="ragged",
                          mla_absorbed=True, **kw)
        want = mk().run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        eng = mk(kv_dtype="int8", logprobs=True)
        assert eng.cache.lat.dtype == jnp.int8
        r = Request(uid=0, prompt=prompt, max_new_tokens=5, temperature=4.0,
                    top_k=1)
        out = eng.run([r])
        # top_k=1 == greedy; int8 latent noise may flip a late token on a
        # random tiny model (the contiguous int8-latent test's bound)
        agree = sum(a == b for a, b in zip(out[0], want[0]))
        assert agree >= 3, (out[0], want[0])
        assert len(r.logprobs) == 5

    def test_speculative_matches_plain_absorbed(self):
        """Round-5: speculation composes with MLA-absorbed serving — the
        target verifies draft chunks over the LATENT cache
        (mla.mla_verify_chunk).  Greedy outputs equal the plain absorbed
        engine's across slot reuse; self-draft accepts everything."""
        model = self._model()
        rng = np.random.default_rng(63)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 9, 4)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=64,
                      mla_absorbed=True).run(reqs())
        eng = Engine(model, max_batch=2, max_seq_len=64, mla_absorbed=True,
                     draft=model, spec_k=3)
        got = eng.run(reqs())
        assert got == want
        assert eng.spec_proposed > 0
        # self-draft: every proposal the target would emit is accepted
        assert eng.spec_accepted == eng.spec_proposed

    def test_moe_deepseek_absorbed(self):
        """Absorbed decode composes with the DeepSeek MoE MLP (shared
        experts + sigmoid routing) and a dense first layer."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, moe_num_experts=8, moe_top_k=2,
            moe_intermediate_size=32, moe_dense_layers=(0,),
            moe_sigmoid_routing=True, moe_n_group=4, moe_topk_group=2,
            moe_routed_scale=2.5, moe_shared_experts=1)
        model = random_packed_llama(cfg, group_size=16, seed=57,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(58)
        prompt = rng.integers(0, cfg.vocab_size, (7,)).tolist()
        want = Engine(model, max_batch=1, max_seq_len=64).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        got = Engine(model, max_batch=1, max_seq_len=64,
                     mla_absorbed=True).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert got == want
        # V3-style MLA + MoE through the RAGGED absorbed path too (round-5)
        got_r = Engine(model, max_batch=1, page_size=8, max_seq_len=64,
                       cache_kind="paged", scheduler="ragged",
                       mla_absorbed=True).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert got_r == want

    def test_int8_latent_cache(self):
        """Absorbed MLA with an int8 latent cache: per-layer calibrated
        scales, scale folded into q for scores and into the attended
        context for values; greedy output stays near the full-precision
        absorbed engine (int8-noise level)."""
        model = self._model()
        rng = np.random.default_rng(59)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        want = Engine(model, max_batch=1, max_seq_len=64,
                      mla_absorbed=True).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=6)])[0]
        eng = Engine(model, max_batch=1, max_seq_len=64, mla_absorbed=True,
                     kv_dtype="int8")
        assert eng.cache.lat.dtype == jnp.int8
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=6)])[0]
        agree = sum(a == b for a, b in zip(got, want))
        assert agree >= 4, (got, want)  # int8 noise may flip a late token


class TestFusedStages:
    """fuse_stage_linears: q/k/v and gate/up stage-mates sharing one
    act-order perm fuse into single PackedLinears — bit-identical
    forward, one activation gather + one kernel dispatch per stage."""

    def test_forward_bit_identical(self, packed_model):
        from gptq_v2_tpu.serving.model import (fuse_stage_linears,
                                               packed_forward_logits)

        model, _ = packed_model
        fused = fuse_stage_linears(model)
        assert "self_attn.qkv_proj" in fused.layers[0]
        assert "mlp.gate_up_proj" in fused.layers[0]
        rng = np.random.default_rng(51)
        toks = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (2, 9)))
        a = packed_forward_logits(model, toks)
        b = packed_forward_logits(fused, toks)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0

    @pytest.mark.parametrize("desc,kw", [
        ("qwen2-bias", dict(qkv_bias=True)),
        ("olmo2-flatnorm", dict(postnorm_only=True, qk_norm_flat=True)),
        ("qwen3-qknorm", dict(qk_norm=True)),
        ("gemma2", dict(sliding_window=8, sandwich_norms=True,
                        norm_unit_offset=True, embed_normalizer=True,
                        hidden_act="gelu_pytorch_tanh",
                        attn_logit_softcap=50.0,
                        layer_types=("sliding_attention",
                                     "full_attention"))),
    ])
    def test_family_variants_bit_identical(self, desc, kw):
        """Fusion must respect biased QKV (concat biases), flat-QK-norm
        (applied after the split), head-dim QK-norm, and sandwich-norm
        families."""
        from gptq_v2_tpu.serving.model import (fuse_stage_linears,
                                               packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, **kw)
        model = random_packed_llama(cfg, group_size=16, seed=53,
                                    compute_dtype=jnp.float32)
        fused = fuse_stage_linears(model)
        assert "self_attn.qkv_proj" in fused.layers[0], desc
        if kw.get("qkv_bias"):
            assert "self_attn.qkv_proj.bias" in fused.layers[0]
        rng = np.random.default_rng(54)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)))
        a = packed_forward_logits(model, toks)
        b = packed_forward_logits(fused, toks)
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-5 * max(1.0, float(jnp.max(jnp.abs(a)))), (desc, err)

    def test_down_perm_folded_into_gate_up(self, packed_model):
        """fold_down_perm_layer: down's act-order perm disappears (folded
        into gate/up OUTPUT columns) and the forward stays bit-identical
        (covered by test_forward_bit_identical, which runs the fold via
        fuse_stage_linears)."""
        from gptq_v2_tpu.serving.model import fuse_stage_linears

        model, _ = packed_model
        assert model.layers[0]["mlp.down_proj"].perm is not None
        fused = fuse_stage_linears(model)
        for lp in fused.layers:
            assert lp["mlp.down_proj"].perm is None
            assert lp["mlp.gate_up_proj"].perm is not None

    def test_down_perm_folds_unfused_gate_up(self):
        """The fold also applies when stage fusion does NOT trigger
        (distinct gate/up quantization layouts): separate gate/up get
        column-permuted and down's runtime gather still disappears."""
        from gptq_v2_tpu.serving.model import (fold_down_perm_layer,
                                               packed_forward_logits,
                                               random_packed_llama)
        import dataclasses as dc

        cfg = L.LlamaConfig.tiny(num_hidden_layers=1)
        model = random_packed_llama(cfg, group_size=16, seed=57,
                                    compute_dtype=jnp.float32)
        layers = tuple(fold_down_perm_layer(lp) for lp in model.layers)
        folded = dc.replace(model, layers=layers)
        assert folded.layers[0]["mlp.down_proj"].perm is None
        rng = np.random.default_rng(58)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)))
        a = packed_forward_logits(model, toks)
        b = packed_forward_logits(folded, toks)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0

    def test_engine_fused_matches_unfused(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(52)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (7, 4)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=6)
                        for i, p in enumerate(prompts)]
        ref = Engine(model, max_batch=2, max_seq_len=64,
                     fuse_stages=False).run(reqs())
        got = Engine(model, max_batch=2, max_seq_len=64).run(reqs())
        assert got == ref

    def test_quantized_pipeline_model_fuses(self, packed_model):
        """A really-quantized act-order model: q/k/v perms are equal (one
        stage Hessian) so the packer dedupe + fusion kick in."""
        from gptq_v2_tpu.serving.model import fuse_stage_linears

        model, results = packed_model
        fused = fuse_stage_linears(model)
        p = fused.layers[0].get("self_attn.qkv_proj")
        assert p is not None
        assert p.out_features == (
            model.cfg.num_attention_heads * model.cfg.head_dim_
            + 2 * model.cfg.num_key_value_heads * model.cfg.head_dim_)


class TestMultiStep:
    """Engine(multi_step=k): k fused decode+sample steps per host sync."""

    def test_greedy_matches_single_step(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(11)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (7, 5, 9)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=10)
                        for i, p in enumerate(prompts)]
        ref = Engine(model, max_batch=2, page_size=8,
                     max_seq_len=64).run(reqs())
        got = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     multi_step=4).run(reqs())
        assert got == ref

    def test_ragged_multi_step_matches_single(self, packed_model):
        """Engine(multi_step=k, scheduler='ragged'): decode-only ticks fuse
        k ragged steps; greedy outputs are token-identical to the
        single-step ragged engine (mixed prefill ticks stay single-step,
        so chunked admission still interleaves)."""
        model, _ = packed_model
        rng = np.random.default_rng(41)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (23, 5, 11)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=9)
                        for i, p in enumerate(prompts)]
        ref = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged",
                     token_budget=16).run(reqs())
        got = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged",
                     token_budget=16, multi_step=4).run(reqs())
        assert got == ref

    def test_ragged_multi_step_eos_discards_tail(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(42)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        ref_out = greedy_full_recompute(model, prompt, 8)
        eos = ref_out[2]
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", multi_step=4,
                     eos_token_id=eos)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert out[0] == ref_out[:3]

    def test_multi_step_composes_with_int4_kv(self, packed_model):
        """Engine(kv_dtype='int4', multi_step=k): the fused fori tick runs
        the int4 two-pass attention path; tokens match the single-step
        int4 engine exactly (same quantized cache trajectory)."""
        model, _ = packed_model
        rng = np.random.default_rng(61)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()
        mk = lambda **kw: Engine(model, max_batch=2, max_seq_len=64,
                                 cache_kind="contiguous", kv_dtype="int4",
                                 **kw)
        ref = mk().run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        got = mk(multi_step=4).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert got == ref

    def test_multi_step_composes_with_prefix_cache(self, packed_model):
        """Ragged multi-step + prefix caching: the second identical prompt
        reuses cached pages AND decode-only ticks fuse k steps."""
        model, _ = packed_model
        rng = np.random.default_rng(62)
        prompt = rng.integers(0, model.cfg.vocab_size, (21,)).tolist()
        ref = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged",
                     token_budget=16).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=6)])[0]
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", token_budget=16,
                     prefix_cache=True, multi_step=4)
        first = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=6)])[0]
        second = eng.run([Request(uid=1, prompt=prompt, max_new_tokens=6)])[1]
        assert first == ref and second == ref
        assert eng.prefix_hit_tokens == 16

    def test_fori_matches_unroll(self, packed_model):
        """The fori_loop tick and the unrolled tick share one PRNG chain
        and must emit identical tokens (decode_sample_loop is a drop-in
        twin of decode_sample_multi)."""
        model, _ = packed_model
        rng = np.random.default_rng(15)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 8)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=9,
                                temperature=0.7 if i else 0.0)
                        for i, p in enumerate(prompts)]
        a = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                   multi_step=4, multi_step_impl="fori", seed=3).run(reqs())
        b = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                   multi_step=4, multi_step_impl="unroll", seed=3).run(reqs())
        assert a == b

    def test_eos_mid_chunk_discards_tail(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(12)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        ref_out = greedy_full_recompute(model, prompt, 8)
        eos = ref_out[2]  # force a stop on the 3rd generated token
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     multi_step=4, eos_token_id=eos)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
        assert out[0] == ref_out[:3]  # truncated AT the stop, tail dropped

    def test_near_cap_falls_back(self, packed_model):
        """A slot within k of max_seq_len must still finish correctly."""
        model, _ = packed_model
        rng = np.random.default_rng(13)
        prompt = rng.integers(0, model.cfg.vocab_size, (24,)).tolist()
        expected = greedy_full_recompute(model, prompt, 7)
        eng = Engine(model, max_batch=1, page_size=8, max_seq_len=32,
                     multi_step=4)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=7)])
        assert out[0] == expected

    def test_sampling_matches_with_logprobs(self, packed_model):
        model, _ = packed_model
        rng = np.random.default_rng(14)
        prompt = rng.integers(0, model.cfg.vocab_size, (5,)).tolist()
        req = lambda: Request(uid=0, prompt=prompt, max_new_tokens=6,
                              temperature=0.8, top_k=8)
        ref = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     logprobs=True, seed=7)
        r1 = ref.run([req()])
        got = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     logprobs=True, seed=7, multi_step=3)
        r2 = got.run([req()])
        # PRNG key schedules differ between tick shapes, so sampled tokens
        # may differ; assert structure: logprobs recorded per token, finite
        assert len(r2[0]) == 6
        eng_req = Request(uid=0, prompt=prompt, max_new_tokens=6,
                          temperature=0.8, top_k=8)
        got.add_request(eng_req)
        while got.queue or any(s is not None for s in got.slots):
            got.step()
        assert len(eng_req.logprobs) == len(eng_req.output)
        assert all(np.isfinite(lp) for lp in eng_req.logprobs)


class TestSnapshotRestore:
    """Crash recovery: snapshot mid-run, restore on a fresh engine, greedy
    outputs identical to the uninterrupted run."""

    def test_mid_run_snapshot_resumes_identically(self, packed_model):
        from gptq_v2_tpu.serving.engine import restore_requests

        model, _ = packed_model
        rng = np.random.default_rng(21)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (7, 5)]
        mk_reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=8)
                           for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, page_size=8,
                      max_seq_len=64).run(mk_reqs())

        # run a few ticks, snapshot, abandon the engine ("crash")
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64)
        for r in mk_reqs():
            eng.add_request(r)
        for _ in range(5):
            eng.step()
        snap = eng.snapshot()
        assert snap["requests"], snap  # work in flight

        reqs, prefixes = restore_requests(snap)
        fresh = Engine(model, max_batch=2, page_size=8, max_seq_len=64)
        out = fresh.run(reqs)
        got = {uid: prefixes[uid] + out.get(uid, []) for uid in prefixes}
        assert got == want

    def test_snapshot_file_lifecycle(self, packed_model, tmp_path):
        """run(snapshot_path=...) writes snapshots during the run and
        removes the file on clean completion."""
        import json
        import os

        model, _ = packed_model
        rng = np.random.default_rng(22)
        prompt = rng.integers(0, model.cfg.vocab_size, (6,)).tolist()
        path = str(tmp_path / "state.json")
        seen = {}
        eng = Engine(model, max_batch=1, page_size=8, max_seq_len=64)
        orig_step = eng.step

        def spy_step():
            orig_step()
            if os.path.exists(path):
                with open(path) as f:
                    seen.update(json.load(f))

        eng.step = spy_step
        eng.run([Request(uid=0, prompt=prompt, max_new_tokens=24)],
                snapshot_path=path, snapshot_every=4)
        assert seen.get("requests"), "no snapshot was ever written"
        assert not os.path.exists(path)  # cleared on clean completion
