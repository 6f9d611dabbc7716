"""Tensor/data-parallel paths on the virtual 8-device CPU mesh.

Equivalence oracle: every sharded computation must match its single-device
twin (the reference-parity-tested serving/pipeline code) to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.pipeline import QuantConfig, quantize_model
from gptq_v2_tpu.parallel import (
    build_tp_decode_step,
    build_tp_prefill,
    dp_hessian_step,
    make_mesh,
    shard_packed_llama,
)
from gptq_v2_tpu.parallel.tp import build_tp_forward_logits, shard_cache
from gptq_v2_tpu.quant import hessian as hs
from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import quantize_params_to_packed


def _tiny_packed(kv_heads=2, seed=2):
    cfg = L.LlamaConfig.tiny(dtype="float32", num_key_value_heads=kv_heads)
    params = L.init_params(cfg, jax.random.key(seed))
    rng = np.random.default_rng(1)
    calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
    params_q = {
        "embed_tokens": params["embed_tokens"],
        "layers": [dict(lp) for lp in params["layers"]],
        "norm": params["norm"],
        "lm_head": params["lm_head"],
    }
    results = quantize_model(cfg, params_q, calib,
                             QuantConfig(bits=4, group_size=16), batch_size=4)
    model = quantize_params_to_packed(cfg, params_q, results["data"],
                                      compute_dtype=jnp.float32)
    return model


@pytest.fixture(scope="module")
def tiny_packed():
    return _tiny_packed()


class TestTPForward:
    @pytest.mark.parametrize("tp", [2])
    def test_matches_single_device(self, tiny_packed, tp):
        from gptq_v2_tpu.serving.model import packed_forward_logits

        model = tiny_packed
        mesh = make_mesh(tp=tp, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(3)
        tokens = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_gemma2_style(self):
        """Gemma-2 family switches under TP: sandwich norms replicate,
        softcaps/sm_scale apply identically, per-layer windows hold."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=16.0,
            layer_types=("sliding_attention", "full_attention"))
        model = random_packed_llama(cfg, group_size=16, seed=15,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(16)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_gemma3_style(self):
        """Gemma-3 under TP: the per-layer local/global rope split selects
        the same tables inside the shard_map'd forward as single-device."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True, qk_norm=True,
            query_pre_attn_scalar=16.0, rope_theta=1000000.0,
            rope_local_base_freq=10000.0,
            layer_types=("sliding_attention", "full_attention"))
        model = random_packed_llama(cfg, group_size=16, seed=17,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(18)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_olmo2_flat_qk_norm(self):
        """OLMo-2 under TP: the flat QK-norm's mean-of-squares spans ALL
        heads, which are column-sharded — the psum'd TP norm must match
        the single-device forward."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, postnorm_only=True,
                                 qk_norm_flat=True)
        model = random_packed_llama(cfg, group_size=16, seed=19,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(20)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_mla_deepseek(self):
        """DeepSeek MLA under TP: q_b/kv_b shard by whole heads, the small
        latent projections (q_a, kv_a) replicate, o row-parallel — TP2
        forward matches single-device."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=23,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(24)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_moe_expert_parallel(self):
        """MoE under TP is expert-parallel: each device holds E/tp WHOLE
        experts (no intra-expert split), the router replicates, and the
        masked-dense partial sums psum over ``model`` — must match the
        single-device masked-dense forward."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32)
        model = random_packed_llama(cfg, group_size=16, seed=35,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        lp0 = tpm.layers[0]
        # local slot names only: 2 experts per device out of 4
        assert "mlp.experts.1.gate_proj" in lp0
        assert "mlp.experts.2.gate_proj" not in lp0
        assert lp0["mlp.router"].ndim == 2  # replicated, unstacked
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(36)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_gptoss_style(self):
        """GPT-OSS under TP: sinks shard per query head, the biased router
        replicates, per-expert biases ride their expert's device (EP), and
        the clamped GLU runs locally — TP2 forward matches single-device."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=71,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        lp0 = tpm.layers[0]
        assert lp0["self_attn.sinks"].shape == (2, 2)  # (tp, hq_loc)
        assert "mlp.experts.1.gate_proj.bias" in lp0  # local expert slots
        assert "mlp.experts.2.gate_proj.bias" not in lp0
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(72)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp2_llama4_style(self):
        """Llama-4 under TP: chunked attention masks + NoPE temperature
        tuning + rope-layer-only QK L2 + input-scaled sigmoid MoE with a
        shared expert — TP2 forward matches single-device."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, nope_layers=(1,),
            layer_types=("chunked_attention", "full_attention"),
            attn_chunk_size=8, qk_l2_norm=True, attn_temp_tuning=True,
            attn_floor_scale=8.0, attn_scale_coef=0.2,
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            moe_dense_layers=(0,), moe_llama4=True, moe_shared_experts=1,
            intermediate_size_dense=48)
        model = random_packed_llama(cfg, group_size=16, seed=73,
                                    compute_dtype=jnp.float32)
        mesh = make_mesh(tp=2, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(74)
        # 12 tokens crosses the chunk boundary (8) and the temp floor (8)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)

    def test_tp4_gqa(self):
        """tp=4 with 4 KV heads exercises 1-head shards + act-order rows."""
        from gptq_v2_tpu.serving.model import packed_forward_logits

        model = _tiny_packed(kv_heads=4, seed=5)
        mesh = make_mesh(tp=4, dp=1)
        tpm = shard_packed_llama(model, mesh)
        fwd = build_tp_forward_logits(mesh)
        rng = np.random.default_rng(6)
        tokens = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (1, 9)))
        got = fwd(tpm, tokens)
        want = packed_forward_logits(model, tokens)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)


class TestTPServing:
    def test_prefill_decode_matches_single_device(self, tiny_packed):
        model = tiny_packed
        cfg = model.cfg
        tp, page_size, max_pages = 2, 8, 4
        mesh = make_mesh(tp=tp, dp=1)
        tpm = shard_packed_llama(model, mesh)

        def mk_cache():
            return kvc.init_cache(cfg.num_hidden_layers, 1 + 2 * max_pages,
                                  page_size, cfg.num_key_value_heads,
                                  cfg.head_dim_, dtype=jnp.float32)

        rng = np.random.default_rng(7)
        b = 2
        plen = np.asarray([5, 7], np.int32)
        lpad = 8
        tokens = np.zeros((b, lpad), np.int32)
        for i in range(b):
            tokens[i, :plen[i]] = rng.integers(0, cfg.vocab_size, (plen[i],))
        bt = np.zeros((b, max_pages), np.int32)
        bt[0, :2] = [1, 2]
        bt[1, :2] = [3, 4]

        # single-device
        c1 = mk_cache()
        log1, c1 = D.prefill(model, jnp.asarray(tokens), c1, jnp.asarray(bt),
                             jnp.asarray(plen))
        next_tok = jnp.argmax(log1, -1).astype(jnp.int32)
        dlog1, c1 = D.decode_step(model, next_tok, c1, jnp.asarray(bt),
                                  jnp.asarray(plen))

        # TP
        c2 = shard_cache(mk_cache(), mesh)
        tp_prefill = build_tp_prefill(mesh, c2)
        tp_decode = build_tp_decode_step(mesh, c2)
        log2, c2 = tp_prefill(tpm, jnp.asarray(tokens), c2, jnp.asarray(bt),
                              jnp.asarray(plen), None)
        dlog2, c2 = tp_decode(tpm, next_tok, c2, jnp.asarray(bt),
                              jnp.asarray(plen))

        scale = float(jnp.abs(log1).max())
        np.testing.assert_allclose(np.asarray(log2), np.asarray(log1),
                                   rtol=0, atol=2e-4 * scale)
        scale = float(jnp.abs(dlog1).max())
        np.testing.assert_allclose(np.asarray(dlog2), np.asarray(dlog1),
                                   rtol=0, atol=2e-4 * scale)


class TestPPServing:
    """GPipe-style layer pipelining (``parallel/pp.py``): microbatches
    rotate through layer stages via ppermute; weights + KV shard by layer."""

    def _roundtrip(self, model, pp, n_steps=4, seed=8, mesh=None):
        from gptq_v2_tpu.parallel.pp import (
            build_pp_decode_step, build_pp_prefill, make_pp_mesh,
            shard_cache_pp, shard_packed_llama_pp)

        cfg = model.cfg
        b, max_len = 4, 32
        rng = np.random.default_rng(seed)
        plen = rng.integers(3, 8, (b,)).astype(np.int32)
        lpad = 8
        tokens = np.zeros((b, lpad), np.int32)
        for i in range(b):
            tokens[i, :plen[i]] = rng.integers(0, cfg.vocab_size, (plen[i],))

        def mk_cache():
            return kvc.init_contiguous_cache(
                cfg.num_hidden_layers, b, max_len, cfg.num_key_value_heads,
                cfg.head_dim_, dtype=jnp.float32)

        # single-device oracle
        c1 = mk_cache()
        log1, c1 = D.prefill(model, jnp.asarray(tokens), c1, None,
                             jnp.asarray(plen), slot=jnp.arange(b))
        # PP
        if mesh is None:
            mesh = make_pp_mesh(pp)
        ppm = shard_packed_llama_pp(model, mesh)
        c2 = shard_cache_pp(mk_cache(), mesh)
        pf = build_pp_prefill(mesh, b)
        dec = build_pp_decode_step(mesh, b)
        log2, c2 = pf(ppm, jnp.asarray(tokens), c2, jnp.asarray(plen))
        scale = float(jnp.abs(log1).max())
        np.testing.assert_allclose(np.asarray(log2), np.asarray(log1),
                                   rtol=0, atol=2e-4 * scale)
        pos = jnp.asarray(plen)
        tok1 = tok2 = jnp.argmax(log1, -1).astype(jnp.int32)
        for _ in range(n_steps):
            dlog1, c1 = D.decode_step(model, tok1, c1, None, pos)
            dlog2, c2 = dec(ppm, tok2, c2, pos)
            scale = float(jnp.abs(dlog1).max())
            np.testing.assert_allclose(np.asarray(dlog2), np.asarray(dlog1),
                                       rtol=0, atol=3e-4 * scale)
            tok1 = jnp.argmax(dlog1, -1).astype(jnp.int32)
            tok2 = jnp.argmax(dlog2, -1).astype(jnp.int32)
            assert (np.asarray(tok1) == np.asarray(tok2)).all()
            pos = pos + 1

    def test_pp2_prefill_decode_matches_single_device(self, tiny_packed):
        self._roundtrip(tiny_packed, pp=2)  # 2 layers -> 1 per stage

    def test_pp2_tp2_composed_matches_single_device(self):
        """TPxPP on a ('stage','model') mesh: PP across the outer axis,
        Megatron shards within a stage, KV heads sharded over model."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=4, num_key_value_heads=2,
                                 qkv_bias=True, dtype="float32")
        model = random_packed_llama(cfg, group_size=16, seed=19,
                                    compute_dtype=jnp.float32)
        mesh = make_pp_mesh(pp=2, tp=2)
        assert mesh.axis_names == ("stage", "model")
        self._roundtrip(model, pp=2, n_steps=3, seed=11, mesh=mesh)

    def test_pp2_tp2_moe_composed(self):
        """MoE under TPxPP: layers shard over ``stage``, whole experts over
        ``model`` (expert parallelism), router replicated everywhere."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=4, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32,
                                 dtype="float32")
        model = random_packed_llama(cfg, group_size=16, seed=37,
                                    compute_dtype=jnp.float32)
        mesh = make_pp_mesh(pp=2, tp=2)
        self._roundtrip(model, pp=2, n_steps=3, seed=13, mesh=mesh)

    def test_pp2_moe_matches_single_device(self):
        """MoE under pure PP (tp=1): every stage holds its layers' full
        expert set and block_core's masked-dense fallback runs unchanged."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32,
                                 dtype="float32")
        model = random_packed_llama(cfg, group_size=16, seed=38,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=14)

    def test_pp2_gptoss_style(self):
        """GPT-OSS over PP stages: sinks + biased router + per-expert
        biases + clamped GLU stack by layer; prefill + decode match
        single-device."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, moe_num_experts=4, moe_top_k=2,
            moe_intermediate_size=32, attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=81,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=82)

    def test_pp2_mla_deepseek(self):
        """DeepSeek MLA under pure PP (tp=1): the latent projections run
        inside block_core on each stage unchanged; the padded-v cache
        shards by layer like any contiguous cache."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=91,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=92)

    def test_pp2_tp2_mla_deepseek(self):
        """MLA under TPxPP (round-3 gap): within each stage the pure-TP
        split applies — q_b/kv_b column-parallel by whole heads, latent
        q_a/kv_a replicated, o row-parallel — while layers shard over
        ``stage`` as usual."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        from gptq_v2_tpu.parallel.pp import make_pp_mesh

        model = random_packed_llama(cfg, group_size=16, seed=95,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=96,
                        mesh=make_pp_mesh(2, 2))

    def test_pp2_mla_moe_deepseek_v3(self):
        """Full DeepSeek-V3 shape under PP: MLA + sigmoid-routed MoE with
        shared experts (stage-periodic layer pattern)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, moe_num_experts=4, moe_top_k=2,
            moe_intermediate_size=32, moe_sigmoid_routing=True,
            moe_shared_experts=1)
        model = random_packed_llama(cfg, group_size=16, seed=93,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=94)

    def test_pp2_tp2_mla_moe_deepseek_v3(self):
        """DeepSeek-V3 shape under TPxPP: MLA head-split + expert-parallel
        MoE within stages."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, moe_num_experts=4, moe_top_k=2,
            moe_intermediate_size=32, moe_sigmoid_routing=True,
            moe_shared_experts=1)
        model = random_packed_llama(cfg, group_size=16, seed=97,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=98,
                        mesh=make_pp_mesh(2, 2))

    def test_pp2_llama4_style(self):
        """Llama-4 over PP stages: a stage-periodic pattern (period 2 =
        layers_per_stage) of chunked/full attention, rope-QK-L2/NoPE-temp
        layers, and dense/input-scaled-MoE MLPs; prefill + decode match
        single-device."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=4, nope_layers=(1, 3),
            layer_types=("chunked_attention", "full_attention") * 2,
            attn_chunk_size=8, qk_l2_norm=True, attn_temp_tuning=True,
            attn_floor_scale=8.0, attn_scale_coef=0.2,
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            moe_dense_layers=(0, 2), moe_llama4=True, moe_shared_experts=1,
            intermediate_size_dense=48)
        model = random_packed_llama(cfg, group_size=16, seed=83,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=3, seed=84)

    def test_pp2_tp2_gptoss_composed(self):
        """TPxPP for GPT-OSS: sinks shard per query head over ``model``
        while layers stack over ``stage``; expert biases ride their
        expert's device."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, moe_num_experts=4, moe_top_k=2,
            moe_intermediate_size=32, attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=85,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=2, n_steps=2, seed=86,
                        mesh=make_pp_mesh(2, 2))

    def test_pp4_gemma2_style(self):
        """4 stages x 2 layers/stage with the Gemma-2 switches (alternating
        windows are stage-periodic at an even layers_per_stage)."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=8, sliding_window=8,
            hidden_act="gelu_pytorch_tanh", norm_unit_offset=True,
            sandwich_norms=True, embed_normalizer=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_pre_attn_scalar=16.0,
            layer_types=tuple(
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(8)))
        model = random_packed_llama(cfg, group_size=16, seed=17,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, pp=4, n_steps=3, seed=9)


class TestTPEngine:
    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_engine_over_mesh_matches_single_device(self, tiny_packed, kind):
        """Continuous batching through the TP steps == single-device engine."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import packed_forward_logits

        model = tiny_packed
        rng = np.random.default_rng(21)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 3)]
        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                          cache_kind=kind, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    def test_gptoss_engine_over_mesh_matches_single_device(self):
        """GPT-OSS end-to-end serving over a TP mesh (contiguous cache —
        sinks need the dense path): greedy outputs == single-device."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=75,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(76)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (11, 5)]
        def mk(mesh=None):
            return Engine(model, max_batch=2, max_seq_len=32, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    @pytest.mark.parametrize("scheduler", ["phased", "ragged"])
    def test_gptoss_paged_over_mesh_matches_single_device(self, scheduler):
        """GPT-OSS over a TP mesh on the PAGED cache (round-3 gap): local
        sinks ride the per-q-head column shard into the sink-extended
        ragged kernel fork; phased and ragged schedulers both match the
        single-device paged engine."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            attn_sinks=True, moe_gptoss=True)
        model = random_packed_llama(cfg, group_size=16, seed=79,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(80)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (11, 5)]
        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                          cache_kind="paged", scheduler=scheduler, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    @pytest.mark.parametrize("scheduler", ["phased", "ragged"])
    def test_llama4_paged_over_mesh_matches_single_device(self, scheduler):
        """Llama-4 over a TP mesh on the PAGED cache (round-3 gap):
        chunk-rebased block tables + NoPE temperature fold in the TP
        paged decode/ragged steps; greedy outputs == single-device."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, nope_layers=(1,),
            layer_types=("chunked_attention", "full_attention"),
            attn_chunk_size=8, qk_l2_norm=True, attn_temp_tuning=True,
            attn_floor_scale=8.0, attn_scale_coef=0.2,
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            moe_dense_layers=(0,), moe_llama4=True, moe_shared_experts=1,
            intermediate_size_dense=48)
        model = random_packed_llama(cfg, group_size=16, seed=81,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(82)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (11, 6)]
        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                          cache_kind="paged", scheduler=scheduler, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    @pytest.mark.parametrize("scheduler", ["phased", "ragged"])
    def test_int4_paged_over_mesh_matches_single_device(self, scheduler):
        """int4 KV + TP (round-3 gap): the paged pool's nibble-packed
        combined axis shards over ``model`` (adjacent pairs keep real
        heads contiguous, aligning with the q column shard); greedy
        outputs == the single-device paged int4 engine."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_key_value_heads=4)
        model = random_packed_llama(cfg, group_size=16, seed=87,
                                    compute_dtype=jnp.float32)
        assert model.cfg.num_key_value_heads % 4 == 0  # 2*tp pairs
        rng = np.random.default_rng(85)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (9, 6)]

        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                          cache_kind="paged", kv_dtype="int4",
                          scheduler=scheduler, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        eng = mk(mesh=make_mesh(tp=2, dp=1))
        assert eng.cache.kv_bits == 4
        got = eng.run(reqs())
        assert got == want

    def test_llama4_engine_over_mesh_matches_single_device(self):
        """Llama-4 end-to-end serving over a TP mesh (contiguous cache):
        chunk masks + temperature tuning in the TP decode step, EP
        input-scaled MoE — greedy outputs == single-device."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, nope_layers=(1,),
            layer_types=("chunked_attention", "full_attention"),
            attn_chunk_size=8, qk_l2_norm=True, attn_temp_tuning=True,
            attn_floor_scale=8.0, attn_scale_coef=0.2,
            moe_num_experts=4, moe_top_k=2, moe_intermediate_size=32,
            moe_dense_layers=(0,), moe_llama4=True, moe_shared_experts=1,
            intermediate_size_dense=48)
        model = random_packed_llama(cfg, group_size=16, seed=77,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(78)
        # generation crosses the chunk boundary (8) and the temp floor
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (11, 6)]
        def mk(mesh=None):
            return Engine(model, max_batch=2, max_seq_len=32, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want


class TestTPMLAEngine:
    def test_mla_engine_over_mesh_matches_single_device(self):
        """DeepSeek MLA serving through Engine(mesh=...): TP prefill +
        decode over the head-sharded padded-KV cache == single-device."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=25,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(26)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (6, 9, 4)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=64).run(reqs())
        got = Engine(model, max_batch=2, max_seq_len=64,
                     mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want


class TestTPSpecEngine:
    def test_speculative_engine_over_mesh_matches_single_device(
            self, tiny_packed):
        """Engine(mesh=..., draft=...): TP target verification inside
        continuous batching == the single-device speculative engine."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        model = tiny_packed
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=81,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(82)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 4, 9)]

        def mk(mesh=None):
            return Engine(model, max_batch=2, max_seq_len=64, draft=draft,
                          spec_k=2, mesh=mesh)

        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    def test_ragged_spec_over_mesh_matches_single_device(self, tiny_packed):
        """Ragged speculative serving over a TP mesh (round-3 gap): the
        mixed verify dispatch runs tensor-parallel
        (tp.build_tp_ragged_spec_step) while the small draft stays
        single-device; greedy outputs == the single-device ragged spec
        engine across chunked admission."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        model = tiny_packed
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=83,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(84)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (21, 5, 9)]

        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                          cache_kind="paged", scheduler="ragged",
                          token_budget=16, draft=draft, spec_k=2, mesh=mesh)

        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want


class TestPPEngine:
    def test_pp_engine_int8_kv_matches_single_device(self, tiny_packed):
        """int8 KV under PP: per-layer scales slice stage-locally inside
        shard_map; same quantization math as the single-device path."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import calibrate_kv_scales

        model = tiny_packed
        scales = calibrate_kv_scales(model)
        rng = np.random.default_rng(29)
        prompt = rng.integers(0, model.cfg.vocab_size, (7,)).tolist()

        def mk(mesh=None):
            return Engine(model, max_batch=4, max_seq_len=32,
                          cache_kind="contiguous", kv_dtype="int8",
                          kv_scales=scales, mesh=mesh)
        want = mk().run([Request(uid=0, prompt=prompt, max_new_tokens=4)])
        eng = mk(mesh=make_pp_mesh(2))
        assert eng.cache.k.dtype == jnp.int8
        got = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=4)])
        assert got == want

    def test_engine_over_pp_mesh_matches_single_device(self, tiny_packed):
        """Continuous batching through the pipelined steps == single-device
        engine (admission, slot reuse, subset prefill via slot mapping)."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh
        from gptq_v2_tpu.serving import Engine, Request

        model = tiny_packed
        rng = np.random.default_rng(23)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 3, 9)]

        def mk(mesh=None):
            return Engine(model, max_batch=4, max_seq_len=32,
                          cache_kind="contiguous", mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_pp_mesh(2)).run(reqs())
        assert got == want


class TestTPRagged:
    def test_ragged_scheduler_over_tp_matches_single_device(self, tiny_packed):
        """Chunked-prefill (ragged) scheduling through the TP mesh == the
        single-chip ragged engine (mixed prefill+decode ticks, multi-tick
        prompt chunking)."""
        from gptq_v2_tpu.serving import Engine, Request

        model = tiny_packed
        rng = np.random.default_rng(31)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (13, 5)]

        def mk(mesh=None):
            return Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                          cache_kind="paged", scheduler="ragged",
                          token_budget=8, mesh=mesh)
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=4)
                        for i, p in enumerate(prompts)]
        want = mk().run(reqs())
        got = mk(mesh=make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want


class TestTPVerifyChunk:
    """Speculative-decoding chunk verification over a TP mesh must equal
    the single-device ``serving.speculative.verify_chunk`` (logits AND
    cache contents), so a multi-chip target can verify a draft's chunk."""

    def _roundtrip(self, model, tp):
        from gptq_v2_tpu.parallel.tp import build_tp_verify_chunk
        from gptq_v2_tpu.serving.speculative import verify_chunk

        cfg = model.cfg
        rng = np.random.default_rng(61)
        b, q, max_len = 2, 3, 32
        plens = np.asarray([5, 7], np.int32)
        lpad = int(plens.max())
        prompts = np.zeros((b, lpad), np.int32)
        for i in range(b):
            prompts[i, :plens[i]] = rng.integers(0, cfg.vocab_size,
                                                 (plens[i],))
        chunk = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, q)).astype(np.int32))

        def mk():
            return kvc.init_contiguous_cache(
                cfg.num_hidden_layers, b, max_len, cfg.num_key_value_heads,
                cfg.head_dim_, dtype=jnp.float32)

        lens = jnp.asarray(plens)
        slot = jnp.arange(b)
        _, c1 = D.prefill(model, jnp.asarray(prompts), mk(), None, lens,
                          slot=slot)
        _, c2 = D.prefill(model, jnp.asarray(prompts), mk(), None, lens,
                          slot=slot)
        want, c1 = verify_chunk(model, chunk, c1, lens)

        mesh = make_mesh(tp=tp, dp=1)
        tpm = shard_packed_llama(model, mesh)
        c2 = shard_cache(c2, mesh)
        tp_verify = build_tp_verify_chunk(mesh, c2)
        got, c2 = tp_verify(tpm, chunk, c2, lens)

        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(c2.k), np.asarray(c1.k),
                                   rtol=0, atol=1e-5)

    def test_tp2_matches_single_device(self, tiny_packed):
        self._roundtrip(tiny_packed, tp=2)

    def test_tp2_moe_matches_single_device(self):
        """Expert-parallel MoE target through the TP verify path."""
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(num_hidden_layers=2, moe_num_experts=4,
                                 moe_top_k=2, moe_intermediate_size=32)
        model = random_packed_llama(cfg, group_size=16, seed=63,
                                    compute_dtype=jnp.float32)
        self._roundtrip(model, tp=2)

    def test_tp_speculative_greedy_matches_oracle(self, tiny_packed):
        """End-to-end: TP-sharded target + single-device draft, greedy
        speculative output == plain greedy decode of the target (the
        Leviathan invariant must survive sharding)."""
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               random_packed_llama)
        from gptq_v2_tpu.serving.speculative import speculative_generate

        target = tiny_packed
        cfg = target.cfg
        dcfg = L.LlamaConfig.tiny(num_hidden_layers=1, hidden_size=32,
                                  intermediate_size=48, num_attention_heads=2,
                                  num_key_value_heads=1)
        draft = random_packed_llama(dcfg, group_size=16, seed=65,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(66)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (6, 3)]
        mesh = make_mesh(tp=2, dp=1)
        out, stats = speculative_generate(target, draft, prompts, 6, k=2,
                                          mesh=mesh)
        for p, o in zip(prompts, out):
            toks = list(p)
            for _ in range(6):
                logits = packed_forward_logits(target, jnp.asarray([toks]))
                toks.append(int(jnp.argmax(logits[0, -1])))
            assert o == toks[len(p):]
        assert stats.rounds >= 2


class TestDPPipeline:
    def test_quantize_model_over_mesh_matches_single_device(self):
        """Full pipeline with calibration sharded over the data axis."""
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        cfg = L.LlamaConfig.tiny(dtype="float32")
        params = L.init_params(cfg, jax.random.key(31))
        rng = np.random.default_rng(32)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)

        def clone():
            return {"embed_tokens": params["embed_tokens"],
                    "layers": [dict(lp) for lp in params["layers"]],
                    "norm": params["norm"], "lm_head": params["lm_head"]}

        qc = QuantConfig(bits=4, group_size=16)
        r1 = quantize_model(cfg, clone(), calib, qc, batch_size=4)
        mesh = make_mesh(tp=1, dp=4)
        r2 = quantize_model(cfg, clone(), calib, qc, batch_size=4, mesh=mesh)
        assert set(r1["data"]) == set(r2["data"])
        total = same = 0
        for name in r1["data"]:
            a = np.asarray(r1["data"][name]["qweight"])
            b = np.asarray(r2["data"][name]["qweight"])
            total += a.size
            same += int((a == b).sum())
            m1, m2 = r1["metrics"][name], r2["metrics"][name]
            assert m2["l2_error"] == pytest.approx(m1["l2_error"], rel=0.05)
        # reduction-order ulps in the Hessian may flip the rare rounding-
        # boundary code; anything beyond that is a sharding bug
        assert same / total > 0.999

    def test_llama4_quantize_over_mesh(self):
        """Llama-4-style DP calibration (round-3 gap): the per-layer QK-L2
        flag threads through every DP builder, so a config with
        qk_l2_norm + NoPE layers + chunked attention quantizes over the
        data axis and matches single-device."""
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, qk_l2_norm=True, nope_layers=(1,),
            attn_temp_tuning=True, attn_floor_scale=8.0, attn_scale_coef=0.2,
            attn_chunk_size=8,
            layer_types=("chunked_attention", "full_attention"),
            dtype="float32")
        assert cfg.layer_qk_l2(0) and not cfg.layer_qk_l2(1)
        params = L.init_params(cfg, jax.random.key(35))
        rng = np.random.default_rng(36)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)

        def clone():
            return {"embed_tokens": params["embed_tokens"],
                    "layers": [dict(lp) for lp in params["layers"]],
                    "norm": params["norm"], "lm_head": params["lm_head"]}

        qc = QuantConfig(bits=4, group_size=16)
        r1 = quantize_model(cfg, clone(), calib, qc, batch_size=4)
        mesh = make_mesh(tp=1, dp=4)
        r2 = quantize_model(cfg, clone(), calib, qc, batch_size=4, mesh=mesh)
        assert set(r1["data"]) == set(r2["data"])
        total = same = 0
        for name in r1["data"]:
            a = np.asarray(r1["data"][name]["qweight"])
            b = np.asarray(r2["data"][name]["qweight"])
            total += a.size
            same += int((a == b).sum())
        assert same / total > 0.999

    def test_moe_wave_quantize_over_mesh(self):
        """MoE wave-fused quantization over the mesh data axis: one
        shard_map'd forward per wave accumulates every expert's partial
        Hessian; result tracks the single-device wave path."""
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        cfg = L.LlamaConfig.tiny(num_hidden_layers=1, moe_num_experts=3,
                                 moe_top_k=2, moe_intermediate_size=32,
                                 dtype="float32")
        params = L.init_params(cfg, jax.random.key(33))
        rng = np.random.default_rng(34)
        calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)

        def clone():
            return {"embed_tokens": params["embed_tokens"],
                    "layers": [dict(lp) for lp in params["layers"]],
                    "norm": params["norm"], "lm_head": params["lm_head"]}

        qc = QuantConfig(bits=4, group_size=16)
        r1 = quantize_model(cfg, clone(), calib, qc, batch_size=4)
        mesh = make_mesh(tp=1, dp=4)
        r2 = quantize_model(cfg, clone(), calib, qc, batch_size=4, mesh=mesh)
        assert set(r1["data"]) == set(r2["data"])
        assert any("experts.2" in k for k in r2["data"])
        total = same = 0
        for name in r1["data"]:
            a = np.asarray(r1["data"][name]["qweight"])
            b = np.asarray(r2["data"][name]["qweight"])
            total += a.size
            same += int((a == b).sum())
        assert same / total > 0.999


class TestDPHessian:
    def test_partials_sum_to_single_device(self):
        cfg = L.LlamaConfig.tiny(dtype="float32")
        params = L.init_params(cfg, jax.random.key(11))
        lp = {k: jnp.asarray(v) for k, v in params["layers"][0].items()}
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((4, 16, cfg.hidden_size)),
                        dtype=jnp.float32)
        cos_sin = L.rope_cos_sin(cfg, jnp.arange(16))
        capture = ("self_attn.q_proj",)

        # single-device oracle
        _, caps = L.block_apply(cfg, lp, x, cos_sin[0], cos_sin[1],
                                capture=capture)
        st = hs.accumulate(hs.init_state(cfg.hidden_size), caps[capture[0]],
                           use_kernel=False)

        mesh = make_mesh(tp=1, dp=4)
        init, step, reduce = dp_hessian_step(mesh, cfg, capture,
                                             use_kernel=False)
        h_parts = init(cfg.hidden_size)
        h_parts = step(lp, x, cos_sin, h_parts)
        got = reduce(h_parts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(st.hessian),
                                   rtol=1e-5, atol=1e-4)

    def test_dp_block_forward(self):
        from gptq_v2_tpu.parallel.dp import dp_block_forward

        cfg = L.LlamaConfig.tiny(dtype="float32")
        params = L.init_params(cfg, jax.random.key(13))
        lp = {k: jnp.asarray(v) for k, v in params["layers"][0].items()}
        rng = np.random.default_rng(14)
        x = jnp.asarray(rng.standard_normal((8, 16, cfg.hidden_size)),
                        dtype=jnp.float32)
        cos_sin = L.rope_cos_sin(cfg, jnp.arange(16))
        want, _ = L.block_apply(cfg, lp, x, cos_sin[0], cos_sin[1])
        mesh = make_mesh(tp=1, dp=8)
        fwd = dp_block_forward(mesh, cfg)
        got = fwd(lp, x, cos_sin)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestRowPsumOverlap:
    """Chunked row-parallel psums (SURVEY §7.8: collectives overlapped
    with the dequant-GEMM)."""

    def test_bounds_tile_aligned(self):
        from gptq_v2_tpu.parallel.tp import _row_chunk_bounds

        assert _row_chunk_bounds(1024) == [(0, 1024)]  # small: one psum
        b = _row_chunk_bounds(11008)
        assert b[0][0] == 0 and b[-1][1] == 11008
        assert all(c1 == n0 for (_, c1), (n0, _) in zip(b, b[1:]))
        assert all((c1 - c0) % 128 == 0 or c1 == 11008 for c0, c1 in b)
        assert len(b) == 4

    def test_chunked_matches_unchunked_and_emits_chunked_allreduces(
            self, tiny_packed):
        """Forward logits are identical with chunking forced on, and the
        lowered module really contains one all-reduce per chunk (the
        structure XLA's latency-hiding scheduler overlaps)."""
        import gptq_v2_tpu.parallel.tp as tp_mod
        from gptq_v2_tpu.serving.model import packed_forward_logits

        model = tiny_packed
        mesh = make_mesh(tp=2, dp=1)
        rng = np.random.default_rng(7)
        tokens = jnp.asarray(rng.integers(0, model.cfg.vocab_size, (2, 8)))
        ref = packed_forward_logits(model, tokens)

        old = tp_mod.ROW_PSUM_CHUNKS

        def run():
            tpm = shard_packed_llama(model, mesh)
            fwd = build_tp_forward_logits(mesh)
            return np.asarray(fwd(tpm, tokens))

        try:
            tp_mod.ROW_PSUM_CHUNKS, chunk_floor = 2, 16
            # tiny model features are far below the 2048 production floor:
            # shrink the floor via monkeypatched bounds for the test
            orig_bounds = tp_mod._row_chunk_bounds

            def bounds(r):
                n = min(2, max(1, r // chunk_floor))
                step = -(-r // n)
                return [(c0, min(c0 + step, r)) for c0 in range(0, r, step)]

            tp_mod._row_chunk_bounds = bounds
            got = run()
        finally:
            tp_mod.ROW_PSUM_CHUNKS = old
            tp_mod._row_chunk_bounds = orig_bounds
        scale = float(np.abs(np.asarray(ref)).max())
        np.testing.assert_allclose(got, np.asarray(ref), rtol=0,
                                   atol=5e-3 * scale)


class TestTPAbsorbedMLAEngine:
    """Absorbed-MLA decode over a TP mesh: q_b + absorbed kv_b halves shard
    by head, the compressed latent cache replicates (serving/mla.py)."""

    def _run(self, kv_dtype="native"):
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=95,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(96)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (7, 5)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=5)
                       for i, p in enumerate(prompts)]

        def mk(mesh=None):
            return Engine(model, max_batch=2, max_seq_len=32,
                          mla_absorbed=True, kv_dtype=kv_dtype, mesh=mesh)

        want = mk().run(reqs())
        got = mk(make_mesh(tp=2, dp=1)).run(reqs())
        assert got == want

    def test_engine_over_mesh_matches_single_device(self):
        self._run()

    def test_engine_over_mesh_int8_latent(self):
        self._run(kv_dtype="int8")

    def test_multi_step_over_mesh_matches_single_device(self):
        """Round-5: the TP-absorbed multi-step fori tick
        (build_tp_mla_decode_step's loop variant) is token-identical to
        the single-device single-step absorbed engine."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16)
        model = random_packed_llama(cfg, group_size=16, seed=99,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(100)
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
                   for n in (7, 5)]
        reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=6)
                        for i, p in enumerate(prompts)]
        want = Engine(model, max_batch=2, max_seq_len=32,
                      mla_absorbed=True).run(reqs())
        eng = Engine(model, max_batch=2, max_seq_len=32, mla_absorbed=True,
                     mesh=make_mesh(tp=2, dp=1), multi_step=3)
        assert eng._mla_tp_loop is not None
        got = eng.run(reqs())
        assert got == want

    def test_v3_moe_over_mesh(self):
        """Absorbed MLA + the full V3 MoE shape (sigmoid routing, shared
        experts) through the TP engine (EP experts)."""
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, mla=True, q_lora_rank=48,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, moe_num_experts=4, moe_top_k=2,
            moe_intermediate_size=32, moe_sigmoid_routing=True,
            moe_shared_experts=1)
        model = random_packed_llama(cfg, group_size=16, seed=97,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(98)
        prompt = rng.integers(0, cfg.vocab_size, (6,)).tolist()

        def mk(mesh=None):
            return Engine(model, max_batch=1, max_seq_len=32,
                          mla_absorbed=True, mesh=mesh)

        want = mk().run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        got = mk(make_mesh(tp=2, dp=1)).run(
            [Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert got == want


from gptq_v2_tpu.serving import Engine, Request  # noqa: E402


class TestMeshMultiStep:
    """Round-5: multi-step decode ticks compose with TP and PP meshes —
    the k-step fori body runs INSIDE the shard_map (tp.build_tp_decode_loop
    / tp.build_tp_ragged_multi / pp.build_pp_decode_loop), so multi-chip
    serving amortizes the per-token host sync.  Oracle: the meshed
    multi-step engine must be token-identical to the single-device
    single-step engine (which is itself oracle-tested against full
    recompute)."""

    def _reqs(self, model, seed=33, lens=(6, 3), new=5):
        rng = np.random.default_rng(seed)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in lens]
        return lambda: [Request(uid=i, prompt=p, max_new_tokens=new)
                        for i, p in enumerate(prompts)]

    @pytest.mark.parametrize("kind", ["contiguous", "paged"])
    def test_tp_phased_multi_step_matches_single_step(self, tiny_packed,
                                                      kind):
        model = tiny_packed
        reqs = self._reqs(model)
        want = Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                      cache_kind=kind).run(reqs())
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=32,
                     cache_kind=kind, mesh=make_mesh(tp=2, dp=1),
                     multi_step=3)
        assert eng._tp_loop is not None
        got = eng.run(reqs())
        assert got == want

    def test_tp_ragged_multi_step_matches_single_step(self, tiny_packed):
        model = tiny_packed
        reqs = self._reqs(model, seed=34, lens=(13, 5))
        want = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                      cache_kind="paged", scheduler="ragged",
                      token_budget=8).run(reqs())
        eng = Engine(model, max_batch=2, page_size=8, max_seq_len=64,
                     cache_kind="paged", scheduler="ragged", token_budget=8,
                     mesh=make_mesh(tp=2, dp=1), multi_step=3)
        assert eng._tp_ragged_multi is not None
        got = eng.run(reqs())
        assert got == want

    def test_pp_multi_step_matches_single_step(self, tiny_packed):
        from gptq_v2_tpu.parallel.pp import make_pp_mesh

        model = tiny_packed
        reqs = self._reqs(model, seed=35, lens=(6, 3, 9), new=4)
        want = Engine(model, max_batch=4, max_seq_len=32,
                      cache_kind="contiguous").run(reqs())
        eng = Engine(model, max_batch=4, max_seq_len=32,
                     cache_kind="contiguous", mesh=make_pp_mesh(2),
                     multi_step=3)
        assert eng._pp_loop is not None
        got = eng.run(reqs())
        assert got == want

    def test_tp_multi_step_sampled_chain_matches_single_device(
            self, tiny_packed):
        """Sampled (temperature + warped) requests: the meshed multi-step
        tick reproduces the single-device multi-step engine's exact PRNG
        chain (same seed => identical tokens)."""
        model = tiny_packed
        rng = np.random.default_rng(36)
        prompts = [rng.integers(0, model.cfg.vocab_size, (n,)).tolist()
                   for n in (6, 3)]

        def reqs():
            return [Request(uid=0, prompt=prompts[0], max_new_tokens=5,
                            temperature=0.8, top_k=4),
                    Request(uid=1, prompt=prompts[1], max_new_tokens=5,
                            temperature=1.2, top_p=0.9)]

        want = Engine(model, max_batch=2, max_seq_len=32, seed=7,
                      multi_step=3).run(reqs())
        got = Engine(model, max_batch=2, max_seq_len=32, seed=7,
                     mesh=make_mesh(tp=2, dp=1), multi_step=3).run(reqs())
        assert got == want

    def test_pp2_tp2_multi_step_matches_single_step(self, tiny_packed):
        """TPxPP composition: the PP multi-step fori tick with TP shards
        inside each stage is token-identical to the single-device
        single-step engine."""
        from gptq_v2_tpu.parallel.pp import make_pp_mesh

        model = tiny_packed
        reqs = self._reqs(model, seed=37, lens=(6, 3, 9, 4), new=4)
        want = Engine(model, max_batch=4, max_seq_len=32,
                      cache_kind="contiguous").run(reqs())
        eng = Engine(model, max_batch=4, max_seq_len=32,
                     cache_kind="contiguous", mesh=make_pp_mesh(2, tp=2),
                     multi_step=3)
        assert eng._pp_loop is not None
        got = eng.run(reqs())
        assert got == want
