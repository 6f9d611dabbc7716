"""End-to-end quantization pipeline + perplexity evaluation on a tiny model."""
import numpy as np
import pytest

import jax

from gptq_v2_tpu.evaluate import evaluate_ppl
from gptq_v2_tpu.models import llama as L
from gptq_v2_tpu.pipeline import QuantConfig, quantize_model


@pytest.fixture(scope="module")
def tiny():
    cfg = L.LlamaConfig.tiny()
    params = L.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32)
    evalset = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
    return cfg, params, calib, evalset


def clone_params(params):
    return {
        "embed_tokens": params["embed_tokens"],
        "layers": [dict(lp) for lp in params["layers"]],
        "norm": params["norm"],
        "lm_head": params["lm_head"],
    }


class TestQuantizeModel:
    def test_int8_near_lossless(self, tiny):
        cfg, params, calib, evalset = tiny
        ppl_fp = evaluate_ppl(cfg, clone_params(params), evalset, batch_size=2)
        p = clone_params(params)
        results = quantize_model(cfg, p, calib, QuantConfig(bits=8, group_size=16),
                                 batch_size=4)
        ppl_q8 = evaluate_ppl(cfg, p, evalset, batch_size=2)
        assert abs(ppl_q8 - ppl_fp) / ppl_fp < 0.02
        # canonical names + schema
        assert "model.layers.0.self_attn.q_proj" in results["data"]
        assert "model.layers.1.mlp.down_proj" in results["metrics"]
        meta = results["data"]["model.layers.0.self_attn.q_proj"]
        assert meta["qweight"].dtype == np.uint8
        assert meta["qweight"].shape == (cfg.num_attention_heads * cfg.head_dim_,
                                         cfg.hidden_size)
        m = results["metrics"]["model.layers.0.self_attn.q_proj"]
        assert set(m) == {"gptq_error", "gptq_norm", "l2_error", "l2_norm"}

    def test_int4_pipeline_sane(self, tiny):
        """INT4 end-to-end: weights actually quantized, ppl bounded, RTN path
        works.  (GPTQ-vs-RTN quality is asserted at the solver level with
        correlated activations — random-init models give near-i.i.d.
        activations where the two coincide by construction.)"""
        cfg, params, calib, _ = tiny
        p_gptq = clone_params(params)
        r = quantize_model(cfg, p_gptq, calib, QuantConfig(bits=4, group_size=16),
                           batch_size=4)
        p_rtn = clone_params(params)
        quantize_model(cfg, p_rtn, calib, QuantConfig(bits=4, group_size=16, rtn=True),
                       batch_size=4)
        # weights replaced by dequantized ones
        w0 = np.asarray(params["layers"][0]["self_attn.q_proj"])
        wq = np.asarray(p_gptq["layers"][0]["self_attn.q_proj"])
        assert not np.allclose(w0, wq)
        ppl_gptq = evaluate_ppl(cfg, p_gptq, calib, batch_size=4)
        ppl_rtn = evaluate_ppl(cfg, p_rtn, calib, batch_size=4)
        ppl_fp = evaluate_ppl(cfg, clone_params(params), calib, batch_size=4)
        assert np.isfinite(ppl_gptq) and np.isfinite(ppl_rtn)
        assert abs(ppl_gptq - ppl_fp) / ppl_fp < 0.10
        # error metrics populated and nonzero for the GPTQ run
        m = r["metrics"]["model.layers.0.self_attn.q_proj"]
        assert m["gptq_error"] > 0.0

    def test_exl2_scale_quant_and_mse(self, tiny):
        """EXL2 quantized scales + MSE search end-to-end (scan-solver path;
        these configs are not kernel-eligible)."""
        from gptq_v2_tpu.quant.quantizer import reconstruct_weight

        cfg, params, calib, _ = tiny
        p = clone_params(params)
        r = quantize_model(
            cfg, p, calib,
            QuantConfig(bits=4, group_size=16, scale_bit_width=4, mse=True,
                        mse_n_grid=8),
            batch_size=4)
        meta = r["data"]["model.layers.0.self_attn.q_proj"]
        assert meta["qscale"] is not None and meta["sscale"] is not None
        assert meta["qscale"].dtype == np.uint8
        w = np.asarray(reconstruct_weight(meta))
        assert np.isfinite(w).all() and np.abs(w).max() > 0
        ppl = evaluate_ppl(cfg, p, calib, batch_size=4)
        ppl_fp = evaluate_ppl(cfg, clone_params(params), calib, batch_size=4)
        assert abs(ppl - ppl_fp) / ppl_fp < 0.15

    def test_resume_rejects_different_config(self, tiny, tmp_path):
        """Saved layers from another QuantConfig must not be resumed."""
        cfg, params, calib, _ = tiny
        quantize_model(cfg, clone_params(params), calib,
                       QuantConfig(bits=8, group_size=16),
                       batch_size=4, save_dir=str(tmp_path))
        r4 = quantize_model(cfg, clone_params(params), calib,
                            QuantConfig(bits=4, group_size=16),
                            batch_size=4, save_dir=str(tmp_path))
        meta = r4["data"]["model.layers.0.self_attn.q_proj"]
        assert meta["group_bit_widths"].tolist() == [4] * (
            cfg.hidden_size // 16)
        assert meta["qweight"].max() <= 15

    def test_resume_bf16_model(self, tmp_path):
        """bf16 scales round-trip the per-layer npz saves (numpy writes
        ml_dtypes.bfloat16 as an opaque void dtype unless bit-cast) and the
        resumed weights reconstruct identically."""
        import jax

        cfg = L.LlamaConfig.tiny(dtype="bfloat16", num_hidden_layers=1)
        params = L.init_params(cfg, jax.random.key(3))
        rng = np.random.default_rng(7)
        calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
        qcfg = QuantConfig(bits=4, group_size=16)
        r1 = quantize_model(cfg, clone_params(params), calib, qcfg,
                            batch_size=4, save_dir=str(tmp_path))
        m1 = r1["data"]["model.layers.0.self_attn.q_proj"]
        assert m1["scale"].dtype == np.dtype("bfloat16")
        # second run resumes every stage from disk
        r2 = quantize_model(cfg, clone_params(params), calib, qcfg,
                            batch_size=4, save_dir=str(tmp_path))
        m2 = r2["data"]["model.layers.0.self_attn.q_proj"]
        assert m2["scale"].dtype == np.dtype("bfloat16")
        np.testing.assert_array_equal(m1["qweight"], m2["qweight"])
        from gptq_v2_tpu.quant.quantizer import reconstruct_weight as rw

        w1 = np.asarray(rw(m1), np.float32)
        w2 = np.asarray(rw(m2), np.float32)
        np.testing.assert_array_equal(w1, w2)

    def test_incremental_matches_legacy(self, tiny):
        """The injected incremental schedule must be numerically equivalent
        to the legacy per-stage full-prefix recompute (same math, different
        program partitioning — only fusion-level fp differences allowed)."""
        cfg, params, calib, _ = tiny
        qcfg = QuantConfig(bits=4, group_size=16)
        p_inc = clone_params(params)
        r_inc = quantize_model(cfg, p_inc, calib, qcfg, batch_size=4,
                               incremental=True)
        p_leg = clone_params(params)
        r_leg = quantize_model(cfg, p_leg, calib, qcfg, batch_size=4,
                               incremental=False)
        for canonical, meta in r_inc["data"].items():
            ml = r_leg["data"][canonical]
            from gptq_v2_tpu.quant.quantizer import reconstruct_weight

            wi = np.asarray(reconstruct_weight(meta))
            wl = np.asarray(reconstruct_weight(ml))
            np.testing.assert_allclose(wi, wl, rtol=1e-5, atol=1e-6,
                                       err_msg=canonical)
            mi = r_inc["metrics"][canonical]
            for k, v in r_leg["metrics"][canonical].items():
                assert abs(mi[k] - v) <= 1e-4 * max(1.0, abs(v)), (canonical, k)

    def test_incremental_plan_structure(self, tiny):
        """Planner on the Llama block: the qkv capture (a norm of the block
        input — no MXU work) is recomputed, attention-out and the MLP input
        are cached, and the wide up-projection activation (> 1.5x hidden)
        is recomputed at the final forward."""
        import jax.numpy as jnp

        from gptq_v2_tpu import graph
        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.pipeline import _plan_incremental

        cfg, params, calib, _ = tiny
        lp0 = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            dict(params["layers"][0]))
        x_st = jax.ShapeDtypeStruct((4, 32, cfg.hidden_size), cfg.jdtype)
        cos, sin = L.rope_cos_sin(cfg, jnp.arange(32))
        cs_st = (jax.ShapeDtypeStruct(cos.shape, cos.dtype),
                 jax.ShapeDtypeStruct(sin.shape, sin.dtype))
        schedule = graph.extract_dependencies(
            lambda p, xb, cs: L.block_apply(cfg, p, xb, cs[0], cs[1])[0],
            lp0, x_st, cs_st)
        stages = [st for st in schedule if st.linears != (graph.OUTPUT,)]
        plan = _plan_incremental(cfg, lp0, x_st, cs_st, stages)

        assert plan.cache == (False, True, True, False)
        assert plan.injects[0] == ()
        assert plan.injects[1] == ()  # attn capture needs the real prefix
        assert plan.injects[2] == ("self_attn.o_proj",)
        assert plan.injects[3] == ("mlp.gate_proj",)
        # final forward: residual from x + o(attn), MLP re-applied from h2
        assert set(plan.injects[4]) == {"self_attn.o_proj", "mlp.gate_proj"}
        assert plan.uses_input[4]
        assert not plan.uses_input[3]  # down capture depends only on h2
        assert plan.last_use_of("self_attn.o_proj") == 4
        assert plan.last_use_of("mlp.gate_proj") == 4

    def test_streaming_save(self, tiny, tmp_path):
        cfg, params, calib, _ = tiny
        p = clone_params(params)
        quantize_model(cfg, p, calib, QuantConfig(bits=4, group_size=16),
                       batch_size=4, save_dir=str(tmp_path))
        files = sorted(f.name for f in tmp_path.glob("*.npz"))
        assert len(files) == cfg.num_hidden_layers * 7
        loaded = np.load(tmp_path / "model.layers.0.self_attn.q_proj.npz")
        assert "qweight" in loaded and "metric_gptq_error" in loaded
