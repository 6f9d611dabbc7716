"""Functional Llama: numerics parity with HF transformers + structure."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.graph import OUTPUT, extract_dependencies


@pytest.fixture(scope="module")
def tiny_cfg():
    return L.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return L.init_params(tiny_cfg, jax.random.key(0))


class TestForward:
    def test_shapes_and_finite(self, tiny_cfg, tiny_params):
        tokens = jnp.asarray(np.arange(32).reshape(2, 16) % tiny_cfg.vocab_size)
        logits = L.forward_logits(tiny_cfg, tiny_params, tokens)
        assert logits.shape == (2, 16, tiny_cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())

    def test_causality(self, tiny_cfg, tiny_params):
        """Changing a future token must not change past logits."""
        rng = np.random.default_rng(0)
        t1 = rng.integers(0, tiny_cfg.vocab_size, (1, 16))
        t2 = t1.copy()
        t2[0, -1] = (t2[0, -1] + 1) % tiny_cfg.vocab_size
        l1 = L.forward_logits(tiny_cfg, tiny_params, jnp.asarray(t1))
        l2 = L.forward_logits(tiny_cfg, tiny_params, jnp.asarray(t2))
        np.testing.assert_allclose(np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]))

    def test_gqa_head_grouping(self, tiny_cfg):
        """GQA must tie each query-head group to its kv head."""
        b, n, hq, hkv, hd = 1, 4, 4, 2, 8
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((b, n, hq, hd)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, n, hkv, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, n, hkv, hd)).astype(np.float32))
        out = L.attention(q, k, v)
        # reference: expand kv heads then dense MHA
        k_full = jnp.repeat(k, hq // hkv, axis=2)
        v_full = jnp.repeat(v, hq // hkv, axis=2)
        expected = L.attention(q, k_full, v_full)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)


class TestHFParity:
    @pytest.fixture(scope="class")
    def hf_pair(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg.to_dict(), "torch_dtype": "float32"})
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict

        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        return hf_model, cfg, params

    def test_logits_match_transformers(self, hf_pair):
        import torch

        hf_model, cfg, params = hf_pair
        rng = np.random.default_rng(2)
        tokens = rng.integers(0, cfg.vocab_size, (2, 24))
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(tokens)).logits.numpy()
        ours = np.asarray(L.forward_logits(cfg, params, jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("rope_scaling", [
        {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
         "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
        {"type": "linear", "factor": 2.0},
        {"rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
         "beta_slow": 1.0, "original_max_position_embeddings": 64},
        {"rope_type": "yarn", "factor": 8.0, "mscale": 1.0,
         "mscale_all_dim": 0.8, "truncate": False,
         "original_max_position_embeddings": 64},
    ])
    def test_rope_scaling_matches_transformers(self, rope_scaling):
        """Llama-3 / linear rope scaling vs the HF implementation."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rms_norm_eps=1e-5,
            rope_scaling=dict(rope_scaling), attn_implementation="eager",
        )
        torch.manual_seed(1)
        hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict(
            {**hf_cfg.to_dict(), "torch_dtype": "float32"})
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict

        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(3)
        tokens = rng.integers(0, cfg.vocab_size, (1, 96))  # long enough to scale
        import torch as _t

        with _t.no_grad():
            ref = hf_model(_t.from_numpy(tokens)).logits.numpy()
        ours = np.asarray(L.forward_logits(cfg, params, jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


class TestModelFamilies:
    """Mistral (sliding window) and Qwen2 (QKV biases) against their HF
    implementations — same functional decoder, family switches only."""

    def _parity(self, hf_model, hf_cfg_dict, seqlen, seed, rtol=2e-4):
        import torch

        from gptq_v2_tpu.models.loader import params_from_torch_state_dict

        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg_dict,
                                          "torch_dtype": "float32"})
        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(seed)
        tokens = rng.integers(0, cfg.vocab_size, (2, seqlen))
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(tokens)).logits.numpy()
        ours = np.asarray(L.forward_logits(cfg, params, jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, ref, rtol=rtol, atol=rtol)
        return cfg, params

    def test_qwen2_logits_match_transformers(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(4)
        hf_model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 5)
        assert cfg.qkv_bias and not cfg.o_bias
        assert "self_attn.q_proj.bias" in params["layers"][0]

    def test_mistral_sliding_window_matches_transformers(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.MistralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=16, attn_implementation="eager",
        )
        torch.manual_seed(6)
        hf_model = transformers.MistralForCausalLM(hf_cfg).eval()
        # seqlen 48 > window 16 exercises the windowed mask path
        cfg, _ = self._parity(hf_model, hf_cfg.to_dict(), 48, 7)
        assert cfg.sliding_window == 16

    def test_phi3_logits_match_transformers(self):
        """Phi-3: fused qkv_proj / gate_up_proj checkpoints split row-exact
        into the standard projections; sliding-window attention."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Phi3Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=16, attn_implementation="eager",
            pad_token_id=0,  # Phi3Config defaults to 32000 (> tiny vocab)
        )
        torch.manual_seed(16)
        hf_model = transformers.Phi3ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 48, 17)
        assert cfg.fused_qkv_gate_up
        assert params["layers"][0]["self_attn.q_proj"].shape == (64, 64)
        assert params["layers"][0]["mlp.gate_proj"].shape == (64, 112)

    def test_qwen3_logits_match_transformers(self):
        """Qwen3: head-dim QK-RMSNorm before rope (no QKV biases)."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Qwen3Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(14)
        hf_model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 15)
        assert cfg.qk_norm and not cfg.qkv_bias
        assert "self_attn.q_norm" in params["layers"][0]
        assert params["layers"][0]["self_attn.q_norm"].shape == (16,)

    def test_gemma2_logits_match_transformers(self):
        """Gemma-2: sandwich norms, unit-offset RMSNorm, GeGLU, embedding
        normalizer, query_pre_attn_scalar, attn+final softcapping, and
        alternating sliding/global attention — all against HF eager."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Gemma2Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
            sliding_window=16, query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            attn_implementation="eager",
        )
        torch.manual_seed(10)
        hf_model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
        # seqlen 48 > window 16 exercises sliding layers 0/2 vs global 1/3
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 48, 11,
                                   rtol=5e-4)
        assert cfg.sandwich_norms and cfg.norm_unit_offset
        assert cfg.embed_normalizer and cfg.tie_word_embeddings
        assert cfg.attn_logit_softcap == 50.0
        assert cfg.final_logit_softcap == 30.0
        assert cfg.layer_window(0) == 16 and cfg.layer_window(1) is None
        assert "pre_feedforward_layernorm" in params["layers"][0]

    def test_gemma2_quantize_pipeline(self):
        """End-to-end GPTQ on a Gemma-2-style model: the jaxpr dependency
        scheduler handles the 4-norm block, softcapped eval stays sane."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from gptq_v2_tpu.evaluate import evaluate_ppl
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        hf_cfg = transformers.Gemma2Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
            sliding_window=16, query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            attn_implementation="eager",
        )
        torch.manual_seed(12)
        hf_model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg.to_dict(),
                                          "torch_dtype": "float32"})
        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(0)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)
        ppl_fp = evaluate_ppl(cfg, dict(params), calib, batch_size=4)
        r = quantize_model(cfg, params, calib,
                           QuantConfig(bits=8, group_size=16), batch_size=4)
        assert "model.layers.0.mlp.down_proj" in r["data"]
        ppl_q = evaluate_ppl(cfg, params, calib, batch_size=4)
        assert abs(ppl_q - ppl_fp) / ppl_fp < 0.05

    def test_gemma3_logits_match_transformers(self):
        """Gemma-3: everything Gemma-2 has minus softcaps, plus QK-norm and
        the local/global rope split — sliding layers rotate with
        rope_local_base_freq (10k, unscaled) while full-attention layers
        use rope_theta (1M) — against HF eager."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Gemma3TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
            sliding_window=16, query_pre_attn_scalar=16,
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            layer_types=["sliding_attention", "sliding_attention",
                         "full_attention", "sliding_attention"],
            attn_implementation="eager",
        )
        torch.manual_seed(15)
        hf_model = transformers.Gemma3ForCausalLM(hf_cfg).eval()
        # seqlen 48: > window 16 (sliding vs global) and far enough out
        # that mixing up the two rope bases would blow the tolerance
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 48, 16,
                                   rtol=5e-4)
        assert cfg.rope_local_base_freq == 10000.0
        assert cfg.qk_norm and cfg.sandwich_norms and cfg.norm_unit_offset
        assert cfg.attn_logit_softcap is None
        assert cfg.layer_rope(0) == 1 and cfg.layer_rope(2) == 0
        assert cfg.layer_window(0) == 16 and cfg.layer_window(2) is None
        assert "self_attn.q_norm" in params["layers"][0]

    def test_gemma3_quantize_pipeline(self):
        """End-to-end GPTQ on a Gemma-3-style model: the per-block rope
        selection flows through capture, Hessian, replay, and eval."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from gptq_v2_tpu.evaluate import evaluate_ppl
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        hf_cfg = transformers.Gemma3TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
            sliding_window=16, query_pre_attn_scalar=16,
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            layer_types=["sliding_attention", "full_attention"],
            attn_implementation="eager",
        )
        torch.manual_seed(17)
        hf_model = transformers.Gemma3ForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg.to_dict(),
                                          "torch_dtype": "float32"})
        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(0)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)
        ppl_fp = evaluate_ppl(cfg, dict(params), calib, batch_size=4)
        r = quantize_model(cfg, params, calib,
                           QuantConfig(bits=8, group_size=16), batch_size=4)
        assert "model.layers.0.mlp.down_proj" in r["data"]
        ppl_q = evaluate_ppl(cfg, params, calib, batch_size=4)
        assert abs(ppl_q - ppl_fp) / ppl_fp < 0.05

    def test_smollm3_logits_match_transformers(self):
        """SmolLM3: Llama math with NoPE — every 4th layer skips rotary
        entirely (HF no_rope_layers) — plus tied embeddings; the NoPE
        identity rope table must reproduce HF exactly."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.SmolLM3Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-6,
            rope_theta=2000000.0, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(19)
        hf_model = transformers.SmolLM3ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 20)
        assert cfg.nope_layers == (3,)  # every 4th layer is NoPE
        assert cfg.layer_rope(0) == 0 and cfg.layer_rope(3) == 1
        assert cfg.tie_word_embeddings

    def test_olmo2_logits_match_transformers(self):
        """OLMo-2: post-norm-only block (no input/pre-FFN norms; sublayer
        outputs normed before the residual add) + RMSNorm over ALL heads'
        features of q/k before the head reshape."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Olmo2Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(23)
        hf_model = transformers.Olmo2ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 24)
        assert cfg.postnorm_only and cfg.qk_norm_flat
        lp0 = params["layers"][0]
        assert "input_layernorm" not in lp0
        assert lp0["self_attn.q_norm"].shape == (64,)  # nq*hd, not hd
        assert lp0["self_attn.k_norm"].shape == (32,)

    def test_glm4_logits_match_transformers(self):
        """GLM-4: partial interleaved rotary (first half of head_dim,
        de-interleaved at load so the standard half-rotation applies),
        Gemma-style sandwich norms under GLM weight names, fused
        gate_up_proj, and QKV-only biases."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Glm4Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
            partial_rotary_factor=0.5, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(27)
        hf_model = transformers.Glm4ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 28)
        assert cfg.partial_rotary_factor == 0.5 and cfg.fused_gate_up
        assert cfg.sandwich_norms and not cfg.norm_unit_offset
        assert cfg.qkv_bias and not cfg.o_bias
        lp0 = params["layers"][0]
        assert "pre_feedforward_layernorm" in lp0  # remapped GLM name
        assert lp0["mlp.gate_proj"].shape == (64, 112)  # split from fused

    @pytest.mark.parametrize("q_lora", [48, None])
    def test_deepseek_v3_mla_logits_match_transformers(self, q_lora):
        """DeepSeek-V3 Multi-head Latent Attention (dense layers): low-rank
        q bottleneck (and the direct-q V2-Lite variant), compressed KV
        latent with an MQA-shared interleaved rope key (de-interleaved at
        load), nope|rope split heads, v_head_dim != qk_head_dim."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.DeepseekV3Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, q_lora_rank=q_lora, kv_lora_rank=32,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
            first_k_dense_replace=2, n_routed_experts=4,
            max_position_embeddings=128, rms_norm_eps=1e-5, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(31)
        hf_model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 32)
        assert cfg.mla and cfg.head_dim_ == 24 and cfg.rope_dim_ == 8
        lp0 = params["layers"][0]
        assert "self_attn.kv_b_proj" in lp0
        assert ("self_attn.q_b_proj" in lp0) == (q_lora is not None)

    def test_qwen3_moe_interleaved_dense_layers(self):
        """Heterogeneous blocks: Qwen3-MoE with decoder_sparse_step=2 (odd
        layers MoE, even layers dense MLP) — per-layer shapes, data-driven
        block dispatch, and HF parity."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Qwen3MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, decoder_sparse_step=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            attn_implementation="eager",
        )
        torch.manual_seed(35)
        hf_model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 36)
        assert cfg.moe_dense_layers == (0,)
        assert not cfg.layer_is_moe(0) and cfg.layer_is_moe(1)
        assert "mlp.gate_proj" in params["layers"][0]
        assert "mlp.router" in params["layers"][1]

    def test_deepseek_v3_moe_logits_match_transformers(self):
        """Full DeepSeek-V3: MLA + sigmoid-routed MoE with
        e_score_correction_bias (choice-only), group-limited top-k
        (4 groups, keep 2), routed_scaling_factor, always-on shared
        experts, and a dense first layer (first_k_dense_replace=1)."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.DeepseekV3Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, q_lora_rank=48, kv_lora_rank=32,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
            first_k_dense_replace=1, n_routed_experts=8,
            num_experts_per_tok=2, n_group=4, topk_group=2,
            moe_intermediate_size=32, n_shared_experts=1,
            routed_scaling_factor=2.5, norm_topk_prob=True,
            max_position_embeddings=128, rms_norm_eps=1e-5, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(39)
        hf_model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
        # give the router bias buffer nonzero values so choice != weights
        with torch.no_grad():
            hf_model.model.layers[1].mlp.gate.e_score_correction_bias.uniform_(
                -0.5, 0.5)
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 40)
        assert cfg.mla and cfg.moe_sigmoid_routing
        assert cfg.moe_dense_layers == (0,) and cfg.moe_shared_experts == 1
        assert cfg.moe_n_group == 4 and cfg.moe_topk_group == 2
        lp1 = params["layers"][1]
        assert "mlp.router_bias" in lp1
        assert "mlp.shared_experts.gate_proj" in lp1
        assert "mlp.gate_proj" in params["layers"][0]  # dense first layer

    def test_gpt_oss_logits_match_transformers(self):
        """GPT-OSS: learned attention sinks (extra softmax logit, mass
        dropped), yarn rope, alternating sliding/full layers, and the MoE
        with a biased linear router (softmax over top-k), stacked
        interleaved gate_up expert weights with per-expert biases, and the
        clamped (up+1)*gate*sigmoid(1.702 gate) GLU."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.GptOssConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, num_local_experts=4, num_experts_per_tok=2,
            sliding_window=8, max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=150000.0,
            rope_scaling={"rope_type": "yarn", "factor": 4.0,
                          "beta_fast": 32.0, "beta_slow": 1.0,
                          "truncate": False,
                          "original_max_position_embeddings": 64},
            pad_token_id=0, attn_implementation="eager",
        )
        torch.manual_seed(43)
        hf_model = transformers.GptOssForCausalLM(hf_cfg).eval()
        # make the sinks matter: zero sinks would hide a wiring bug
        with torch.no_grad():
            for lyr in hf_model.model.layers:
                lyr.self_attn.sinks.uniform_(0.5, 2.0)
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 44,
                                   rtol=5e-4)
        assert cfg.attn_sinks and cfg.moe_gptoss
        assert cfg.layer_window(0) == 8 and cfg.layer_window(1) is None
        lp0 = params["layers"][0]
        assert lp0["self_attn.sinks"].shape == (4,)
        assert "mlp.router.bias" in lp0
        assert "mlp.experts.3.down_proj.bias" in lp0

    def test_llama4_logits_match_transformers(self):
        """Llama-4: interleaved full-dim rope (de-interleaved at load),
        weightless post-rope QK L2 norm, NoPE layers with attention-
        temperature tuning (floor_scale shrunk so it BITES at test
        length), chunked attention (chunk 8 < seqlen), and the MoE with
        sigmoid-of-top-k scores scaling the routed INPUT plus a shared
        expert; dense layer at a different MLP width."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Llama4TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            intermediate_size_mlp=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_local_experts=4, num_experts_per_tok=2, moe_layers=[1],
            interleave_moe_layer_step=2, no_rope_layers=[1, 0],
            attention_chunk_size=8, attn_temperature_tuning=True,
            floor_scale=8.0, attn_scale=0.2, use_qk_norm=True,
            max_position_embeddings=128, rms_norm_eps=1e-5, pad_token_id=0,
            attn_implementation="eager",
        )
        torch.manual_seed(47)
        hf_model = transformers.Llama4ForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 48,
                                   rtol=5e-4)
        assert cfg.qk_l2_norm and cfg.attn_temp_tuning
        assert cfg.nope_layers == (1,) and cfg.layer_chunk(0) == 8
        assert cfg.layer_chunk(1) is None  # NoPE layer = full attention
        assert cfg.moe_llama4 and cfg.moe_dense_layers == (0,)
        lp0, lp1 = params["layers"]
        assert lp0["mlp.gate_proj"].shape == (64, 128)  # dense width
        assert lp1["mlp.experts.0.gate_proj"].shape == (64, 112)
        assert "mlp.shared_experts.up_proj" in lp1

    def test_granite_logits_match_transformers(self):
        """Granite: the four scalar multipliers (embedding, residual,
        attention sm-scale, logits divider) set to non-identity values."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.GraniteConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            embedding_multiplier=4.0, residual_multiplier=0.7,
            attention_multiplier=0.2, logits_scaling=3.0,
            pad_token_id=0, attn_implementation="eager",
        )
        torch.manual_seed(51)
        hf_model = transformers.GraniteForCausalLM(hf_cfg).eval()
        cfg, _ = self._parity(hf_model, hf_cfg.to_dict(), 24, 52)
        assert cfg.embed_multiplier == 4.0 and cfg.logits_divider == 3.0
        assert cfg.sm_scale_ == 0.2 and cfg.residual_multiplier == 0.7

    def test_qwen2_quantize_pipeline(self):
        """End-to-end GPTQ on a biased-QKV model: biases survive, ppl sane."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from gptq_v2_tpu.evaluate import evaluate_ppl
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        hf_cfg = transformers.Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            attn_implementation="eager",
        )
        torch.manual_seed(8)
        hf_model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg.to_dict(),
                                          "torch_dtype": "float32"})
        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(0)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)
        ppl_fp = evaluate_ppl(cfg, dict(params), calib, batch_size=4)
        r = quantize_model(cfg, params, calib, QuantConfig(bits=8, group_size=16),
                           batch_size=4)
        assert "model.layers.0.self_attn.q_proj" in r["data"]
        ppl_q = evaluate_ppl(cfg, params, calib, batch_size=4)
        assert abs(ppl_q - ppl_fp) / ppl_fp < 0.05

    def test_mixtral_logits_match_transformers(self):
        """Mixtral MoE: softmax-top-2 routing, per-expert SwiGLU, w1/w3/w2
        checkpoint names; masked-dense expert compute matches HF's
        gather/scatter exactly."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.MixtralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            attn_implementation="eager",
        )
        torch.manual_seed(20)
        hf_model = transformers.MixtralForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 21)
        assert cfg.moe_num_experts == 4 and cfg.moe_top_k == 2
        assert "mlp.router" in params["layers"][0]
        assert params["layers"][0]["mlp.experts.3.down_proj"].shape == (48, 64)

    def test_qwen3_moe_logits_match_transformers(self):
        """Qwen3-MoE: QK-RMSNorm + separate moe_intermediate_size +
        norm_topk_prob routing, gate/up/down checkpoint names."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.Qwen3MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, norm_topk_prob=True,
            max_position_embeddings=128, rms_norm_eps=1e-6,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(22)
        hf_model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
        cfg, params = self._parity(hf_model, hf_cfg.to_dict(), 24, 23)
        assert cfg.qk_norm and cfg.moe_intermediate_ == 32
        assert params["layers"][0]["mlp.experts.0.gate_proj"].shape == (64, 32)

    def test_mixtral_quantize_pipeline(self):
        """End-to-end GPTQ on a MoE model: the jaxpr scheduler discovers
        per-expert Hessian stages (each expert's Hessian accumulates only
        its routed tokens, via the masked capture), the router stays
        unquantized, ppl stays sane."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from gptq_v2_tpu.evaluate import evaluate_ppl
        from gptq_v2_tpu.models.loader import params_from_torch_state_dict
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        hf_cfg = transformers.MixtralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            attn_implementation="eager",
        )
        torch.manual_seed(24)
        hf_model = transformers.MixtralForCausalLM(hf_cfg).eval()
        cfg = L.LlamaConfig.from_hf_dict({**hf_cfg.to_dict(),
                                          "torch_dtype": "float32"})
        params = params_from_torch_state_dict(cfg, hf_model.state_dict())
        rng = np.random.default_rng(1)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)
        ppl_fp = evaluate_ppl(cfg, dict(params), calib, batch_size=4)
        r = quantize_model(cfg, params, calib,
                           QuantConfig(bits=8, group_size=16), batch_size=4)
        for e in range(4):
            assert f"model.layers.0.mlp.experts.{e}.down_proj" in r["data"]
        assert "model.layers.0.mlp.router" not in r["data"]
        ppl_q = evaluate_ppl(cfg, params, calib, batch_size=4)
        assert abs(ppl_q - ppl_fp) / ppl_fp < 0.05

    def test_moe_wave_fusion_bit_identical(self):
        """The wave-fused MoE pipeline (one forward captures all expert
        stages of a level) produces byte-identical quantization to the
        per-stage loop — wave members are mutually independent, so neither
        order can observe the other's quantization."""
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, moe_num_experts=3,
                                 moe_top_k=2, moe_intermediate_size=32)
        rng = np.random.default_rng(61)
        calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
        qc = QuantConfig(bits=4, group_size=16)

        def run(incremental):
            params = L.init_params(cfg, jax.random.key(7))
            params = {"embed_tokens": params["embed_tokens"],
                      "layers": [dict(lp) for lp in params["layers"]],
                      "norm": params["norm"], "lm_head": params["lm_head"]}
            return quantize_model(cfg, params, calib, qc, batch_size=4,
                                  incremental=incremental)

        waved, legacy = run(True), run(False)
        assert set(waved["data"]) == set(legacy["data"])
        for k in waved["data"]:
            np.testing.assert_array_equal(
                np.asarray(waved["data"][k]["qweight"]),
                np.asarray(legacy["data"][k]["qweight"]), err_msg=k)
            np.testing.assert_array_equal(
                np.asarray(waved["data"][k]["scale"]),
                np.asarray(legacy["data"][k]["scale"]), err_msg=k)


class TestDependencySchedule:
    def test_llama_schedule(self, tiny_cfg, tiny_params):
        lp = tiny_params["layers"][0]
        cos, sin = L.rope_cos_sin(tiny_cfg, jnp.arange(8))
        x = jax.ShapeDtypeStruct((2, 8, tiny_cfg.hidden_size), tiny_cfg.jdtype)
        sched = extract_dependencies(
            lambda p, xb, c, s: L.block_apply(tiny_cfg, p, xb, c, s)[0],
            lp, x, cos, sin,
        )
        linears = [st.linears for st in sched]
        assert linears == [
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
            ("self_attn.o_proj",),
            ("mlp.gate_proj", "mlp.up_proj"),
            ("mlp.down_proj",),
            (OUTPUT,),
        ]
        # q,k,v released once o's Hessian is done; input held to the end
        assert set(sched[1].release) == {
            "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"
        }
        assert "input" in sched[-1].release
        # dense blocks: every wave is a singleton (no fusion opportunity)
        from gptq_v2_tpu.graph import stage_waves

        waves = stage_waves(sched[:-1])
        assert [len(w) for w in waves] == [1, 1, 1, 1]
        assert sched[1].parents == ("self_attn.k_proj", "self_attn.q_proj",
                                    "self_attn.v_proj")

    def test_moe_waves_collapse_expert_stages(self):
        """MoE: the 2E per-expert stages are mutually independent — the
        wave grouping collapses them into one gate/up wave and one down
        wave, so a block quantizes in 4 forwards instead of 2E + 2."""
        from gptq_v2_tpu.graph import stage_waves

        cfg = L.LlamaConfig.tiny(num_hidden_layers=1, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32)
        params = L.init_params(cfg, jax.random.key(3))
        lp = params["layers"][0]
        cos, sin = L.rope_cos_sin(cfg, jnp.arange(8))
        x = jax.ShapeDtypeStruct((2, 8, cfg.hidden_size), cfg.jdtype)
        sched = extract_dependencies(
            lambda p, xb, c, s: L.block_apply(cfg, p, xb, c, s)[0],
            lp, x, cos, sin, exclude=L.NON_QUANTIZED_LINEARS,
        )
        waves = stage_waves(sched[:-1])
        assert [len(w) for w in waves] == [1, 1, 4, 4]
        gate_wave = waves[2]
        assert all(st.linears[0].endswith("gate_proj") for st in gate_wave)
        assert all(st.parents == ("input", "self_attn.o_proj")
                   for st in gate_wave)  # residual carries 'input' through
        down_wave = waves[3]
        assert all(st.linears == (f"mlp.experts.{e}.down_proj",)
                   for e, st in enumerate(down_wave))
