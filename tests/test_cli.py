"""CLI driver end-to-end: flags → load → quantize → save → resume → eval."""
import numpy as np
import pytest


def _argv(tc, **over):
    args = {
        "--model-dir": tc["model_dir"],
        "--seqlen": str(tc["seqlen"]),
        "--data-train-n-samples": str(tc["n_train"]),
        "--eval-n-samples": str(tc["n_eval"]),
        "--data-cache-dir": tc["cache_dir"],
        "--batch-size": "2",
        "--group-size": "16",
        "--eval-sets": "train,wikitext2",
        "--save-model-path": str(tc["root"] / "results.npz"),
        "--save-dir": str(tc["root"] / "layers"),
    }
    args.update(over)
    return [x for kv in args.items() for x in kv]


class TestCLI:
    def test_quantize_and_eval(self, tiny_checkpoint):
        from gptq_v2_tpu.main import load_results, main

        out = main(_argv(tiny_checkpoint))
        assert set(out["ppls"]) == {"train", "wikitext2"}
        assert all(np.isfinite(v) and v > 0 for v in out["ppls"].values())
        n_linears = tiny_checkpoint["cfg"].num_hidden_layers * 7
        assert len(out["results"]["data"]) == n_linears
        # round-trip the collated save
        loaded = load_results(str(tiny_checkpoint["root"] / "results.npz"))
        assert set(loaded["data"]) == set(out["results"]["data"])
        some = next(iter(loaded["data"]))
        np.testing.assert_array_equal(loaded["data"][some]["qweight"],
                                      out["results"]["data"][some]["qweight"])

    def test_resume_reproduces(self, tiny_checkpoint):
        """Second run resumes every layer from disk and reproduces ppl."""
        from gptq_v2_tpu.main import main

        first = main(_argv(tiny_checkpoint, **{"--eval-sets": "train"}))
        second = main(_argv(tiny_checkpoint, **{"--eval-sets": "train"}))
        assert second["ppls"]["train"] == pytest.approx(
            first["ppls"]["train"], rel=1e-6)
        some = next(iter(first["results"]["data"]))
        np.testing.assert_array_equal(
            np.asarray(first["results"]["data"][some]["qweight"]),
            np.asarray(second["results"]["data"][some]["qweight"]))

    def test_rtn_flag(self, tiny_checkpoint):
        from gptq_v2_tpu.main import main

        out = main(_argv(tiny_checkpoint, **{
            "--rtn": "true", "--eval-sets": "train",
            "--save-dir": str(tiny_checkpoint["root"] / "layers_rtn"),
            "--save-model-path": "",
        }))
        assert np.isfinite(out["ppls"]["train"])


class TestSweep:
    def test_two_point_sweep(self, tiny_checkpoint):
        from gptq_v2_tpu.sweep import main

        tc = tiny_checkpoint
        rows = main([
            "--model-dir", tc["model_dir"],
            "--bits", "4,8", "--group-sizes", "16",
            "--act-order", "true", "--eval-sets", "train",
            "--seqlen", str(tc["seqlen"]),
            "--data-train-n-samples", str(tc["n_train"]),
            "--eval-n-samples", str(tc["n_eval"]),
            "--data-cache-dir", tc["cache_dir"],
            "--batch-size", "2",
            "--out", str(tc["root"] / "sweep.json"),
        ])
        assert len(rows) == 2
        by_bits = {r["bits"]: r["ppl"]["train"] for r in rows}
        assert by_bits[8] <= by_bits[4] * 1.05  # 8-bit no worse than 4-bit
        assert (tc["root"] / "sweep.json").exists()


class TestServeCLI:
    def test_serve_benchmark(self, tiny_checkpoint):
        from gptq_v2_tpu.main import main as quant_main
        from gptq_v2_tpu.serve import main as serve_main

        tc = tiny_checkpoint
        results_path = str(tc["root"] / "serve_results.npz")
        quant_main(_argv(tc, **{"--eval-sets": "train",
                                "--save-model-path": results_path,
                                "--save-dir": ""}))
        stats = serve_main([
            "--model-dir", tc["model_dir"],
            "--results", results_path,
            "--max-batch", "2", "--max-seq-len", "64",
            "--bench-tokens", "4", "--prompt-tokens", "5",
        ])
        assert stats["new_tokens"] == 8 and stats["tok_s"] > 0

    def test_serve_speculative(self, tiny_checkpoint):
        """--draft-dir switches the CLI into speculative decoding: INT4
        target + bf16 draft (no --draft-results), greedy benchmark."""
        from gptq_v2_tpu.main import main as quant_main
        from gptq_v2_tpu.serve import main as serve_main

        tc = tiny_checkpoint
        results_path = str(tc["root"] / "spec_results.npz")
        quant_main(_argv(tc, **{"--eval-sets": "train",
                                "--save-model-path": results_path,
                                "--save-dir": ""}))
        stats = serve_main([
            "--model-dir", tc["model_dir"],
            "--results", results_path,
            "--draft-dir", tc["model_dir"],  # self-draft in bf16
            "--max-batch", "2", "--max-seq-len", "64",
            "--bench-tokens", "4", "--prompt-tokens", "5", "--spec-k", "2",
        ])
        assert stats["new_tokens"] == 8 and stats["tok_s"] > 0
        assert 0.0 <= stats["accept_rate"] <= 1.0
        assert 1.0 <= stats["tokens_per_round"] <= 3.0

    def test_serve_speculative_engine_mode(self, tiny_checkpoint):
        """--spec-mode engine routes speculation through the continuous-
        batching engine; self-draft greedy accepts everything, so the tick
        count stays far below bench-tokens."""
        from gptq_v2_tpu.serve import main as serve_main

        tc = tiny_checkpoint
        stats = serve_main([
            "--model-dir", tc["model_dir"], "--results", "",
            "--draft-dir", tc["model_dir"],  # self-draft in bf16
            "--spec-mode", "engine",
            "--max-batch", "2", "--max-seq-len", "64",
            "--bench-tokens", "6", "--prompt-tokens", "5", "--spec-k", "2",
        ])
        assert stats["new_tokens"] == 12 and stats["tok_s"] > 0
        assert stats["accept_rate"] == 1.0  # self-draft greedy
        assert stats["ticks"] <= 4  # ceil((6-1)/3) ticks + prefill slack


class TestServeMLA:
    def test_serve_mla_absorbed(self, tmp_path):
        """--mla-absorbed serves a DeepSeek synthetic checkpoint over the
        compressed latent cache."""
        import subprocess, sys
        from pathlib import Path

        gen = (Path(__file__).resolve().parents[1] / "scripts"
               / "make_synthetic_checkpoint.py")
        subprocess.run(
            [sys.executable, str(gen), "--out", str(tmp_path / "ds"),
             "--model-type", "deepseek_v3", "--head-dim", "16",
             "--hidden", "64", "--intermediate", "112", "--layers", "2",
             "--heads", "4", "--kv-heads", "4", "--vocab", "256"],
            check=True)
        from gptq_v2_tpu.serve import main as serve_main

        stats = serve_main([
            "--model-dir", str(tmp_path / "ds"), "--results", "",
            "--mla-absorbed", "true",
            "--max-batch", "2", "--max-seq-len", "64",
            "--bench-tokens", "4", "--prompt-tokens", "5",
        ])
        assert stats["new_tokens"] == 8 and stats["tok_s"] > 0


class TestObservability:
    def test_phase_timer_and_profile_trace(self, tmp_path):
        """The CLI's observability plumbing: named phase wall-clocks plus a
        jax.profiler device trace written under the requested directory."""
        import jax.numpy as jnp

        from gptq_v2_tpu.utils import PhaseTimer, profile_trace

        t = PhaseTimer()
        with profile_trace(str(tmp_path / "tr")):
            with t("work"):
                jnp.ones((8, 8)).sum().block_until_ready()
            with t("work"):  # accumulates
                pass
        assert t.summary()["work"] > 0
        assert list((tmp_path / "tr").rglob("*.xplane.pb"))
        with profile_trace(""):  # falsy = no-op, no directory created
            pass

    def test_main_reports_phases(self, tiny_checkpoint):
        from gptq_v2_tpu.main import main

        out = main(_argv(tiny_checkpoint, **{"--eval-sets": "train"}))
        assert {"load", "data", "quantize", "eval"} <= set(out["phases"])
        assert out["phases"]["quantize"] > 0


class TestSyntheticCheckpoints:
    """The sharded-index load path + every family through the checkpoint
    generator (``scripts/make_synthetic_checkpoint.py``) — the real
    user-facing entry for environments with no HF network access."""

    def _gen(self, tmp_path, **over):
        import subprocess
        import sys
        from pathlib import Path

        script = Path(__file__).resolve().parent.parent / "scripts" / \
            "make_synthetic_checkpoint.py"
        args = {
            "--out": str(tmp_path), "--hidden": "64", "--intermediate": "112",
            "--layers": "2", "--heads": "4", "--kv-heads": "2",
            "--vocab": "256", "--shards": "2", "--dtype": "float32",
        }
        args.update({k: str(v) for k, v in over.items()})
        subprocess.run([sys.executable, str(script)]
                       + [x for kv in args.items() for x in kv], check=True)

    def test_sharded_index_load_matches_params(self, tmp_path):
        """Multi-shard + index.json load produces a working model."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck")
        assert (tmp_path / "ck" / "model.safetensors.index.json").exists()
        assert len(list((tmp_path / "ck").glob("model-*.safetensors"))) == 2
        cfg, params = load_hf_model(tmp_path / "ck")
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert logits.shape == (1, 12, cfg.vocab_size)
        assert bool(jnp.isfinite(logits).all())

    def test_lazy_streaming_load_quantizes(self, tmp_path):
        """``lazy=True`` (the 70B-class path): block weights are deferred
        mmap reads, host RSS stays ~one block; the pipeline quantizes
        through them unchanged (incl. the bf16 transposed-view transfer
        path) and matches the eager load bit-for-bit."""
        import numpy as np

        from gptq_v2_tpu.models.loader import LazyTensor, load_hf_model
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

        self._gen(tmp_path / "ck", **{"--dtype": "bfloat16"})
        cfg, lazy_params = load_hf_model(tmp_path / "ck", lazy=True)
        lp0 = lazy_params["layers"][0]
        assert isinstance(lp0["self_attn.q_proj"], LazyTensor)
        assert lp0["self_attn.q_proj"].shape == (64, 64)
        assert not isinstance(lazy_params["embed_tokens"], LazyTensor)

        rng = np.random.default_rng(5)
        calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
        qc = QuantConfig(bits=4, group_size=16)
        r_lazy = quantize_model(cfg, lazy_params, calib, qc, batch_size=4)
        _, eager_params = load_hf_model(tmp_path / "ck")
        r_eager = quantize_model(cfg, eager_params, calib, qc, batch_size=4)
        assert set(r_lazy["data"]) == set(r_eager["data"])
        for k in r_lazy["data"]:
            np.testing.assert_array_equal(
                np.asarray(r_lazy["data"][k]["qweight"]),
                np.asarray(r_eager["data"][k]["qweight"]), err_msg=k)

    def test_gemma2_checkpoint_roundtrip(self, tmp_path):
        """Gemma-2 checkpoint: tied head, 4 norms/block, softcap config."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck", **{"--model-type": "gemma2",
                                      "--head-dim": "16",
                                      "--sliding-window": "8"})
        cfg, params = load_hf_model(tmp_path / "ck")
        assert cfg.sandwich_norms and cfg.tie_word_embeddings
        assert cfg.final_logit_softcap == 30.0
        assert "post_feedforward_layernorm" in params["layers"][0]
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert bool(jnp.isfinite(logits).all())
        assert float(jnp.abs(logits).max()) <= 30.0  # final softcap bound

    def test_gemma3_checkpoint_roundtrip(self, tmp_path):
        """Gemma-3 checkpoint: QK-norms load, dual-rope config (local 10k /
        global 1M) round-trips, layer_types derive from the pattern."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck", **{"--model-type": "gemma3_text",
                                      "--head-dim": "16",
                                      "--layers": "6",
                                      "--sliding-window": "8"})
        cfg, params = load_hf_model(tmp_path / "ck")
        assert cfg.rope_local_base_freq == 10000.0
        assert cfg.rope_theta == 1000000.0
        assert cfg.qk_norm and cfg.sandwich_norms and cfg.tie_word_embeddings
        assert cfg.attn_logit_softcap is None
        # pattern 6: layers 0-4 sliding (local rope), layer 5 global
        assert cfg.layer_rope(0) == 1 and cfg.layer_rope(5) == 0
        assert "self_attn.q_norm" in params["layers"][0]
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert bool(jnp.isfinite(logits).all())

    def test_smollm3_olmo2_checkpoint_roundtrips(self, tmp_path):
        """SmolLM3 (NoPE layers, tied head) and OLMo-2 (post-norm-only,
        flat QK-norms) synthetic checkpoints load and forward finitely."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "s3", **{"--model-type": "smollm3",
                                      "--layers": "4"})
        cfg, params = load_hf_model(tmp_path / "s3")
        assert cfg.nope_layers == (3,) and cfg.tie_word_embeddings
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        assert bool(jnp.isfinite(L.forward_logits(cfg, params, toks)).all())

        self._gen(tmp_path / "o2", **{"--model-type": "olmo2"})
        cfg, params = load_hf_model(tmp_path / "o2")
        assert cfg.postnorm_only and cfg.qk_norm_flat
        assert "input_layernorm" not in params["layers"][0]
        assert bool(jnp.isfinite(L.forward_logits(cfg, params, toks)).all())

    def test_glm4_checkpoint_roundtrip(self, tmp_path):
        """GLM-4 checkpoint: fused gate_up splits, GLM norm names remap,
        q/k de-interleave, partial-rotary config round-trips."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "g4", **{"--model-type": "glm4",
                                      "--head-dim": "16"})
        cfg, params = load_hf_model(tmp_path / "g4")
        assert cfg.partial_rotary_factor == 0.5 and cfg.fused_gate_up
        assert cfg.qkv_bias and not cfg.o_bias and cfg.sandwich_norms
        lp0 = params["layers"][0]
        assert "pre_feedforward_layernorm" in lp0
        assert lp0["mlp.gate_proj"].shape[1] == cfg.intermediate_size
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        assert bool(jnp.isfinite(L.forward_logits(cfg, params, toks)).all())

    def test_deepseek_v3_checkpoint_roundtrip(self, tmp_path):
        """DeepSeek MLA checkpoint: q/kv low-rank projections load, rope
        rows de-interleave, config round-trips."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ds", **{"--model-type": "deepseek_v3",
                                      "--head-dim": "16"})
        cfg, params = load_hf_model(tmp_path / "ds")
        assert cfg.mla and cfg.qk_rope_head_dim == 8
        assert cfg.moe_sigmoid_routing and cfg.moe_dense_layers == (0,)
        lp0 = params["layers"][0]
        assert "self_attn.kv_a_proj_with_mqa" in lp0
        assert "self_attn.q_a_layernorm" in lp0
        assert "mlp.gate_proj" in lp0  # dense first layer
        lp1 = params["layers"][1]
        assert "mlp.router_bias" in lp1
        assert "mlp.shared_experts.up_proj" in lp1
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        assert bool(jnp.isfinite(L.forward_logits(cfg, params, toks)).all())

    def test_mixtral_checkpoint_roundtrip(self, tmp_path):
        """Mixtral checkpoint: block_sparse_moe.gate router + w1/w3/w2
        expert tensors load into the framework's router/expert names."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck", **{"--model-type": "mixtral",
                                      "--experts": "4", "--top-k": "2",
                                      "--intermediate": "48"})
        cfg, params = load_hf_model(tmp_path / "ck")
        assert cfg.moe_num_experts == 4 and cfg.moe_mixtral_names
        lp = params["layers"][0]
        assert lp["mlp.router"].shape == (64, 4)
        assert lp["mlp.experts.3.down_proj"].shape == (48, 64)
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert bool(jnp.isfinite(logits).all())

    def test_qwen3_moe_checkpoint_roundtrip(self, tmp_path):
        """Qwen3-MoE checkpoint: mlp.gate router, per-expert gate/up/down
        at moe_intermediate_size, QK-norm weights present."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck", **{"--model-type": "qwen3_moe",
                                      "--experts": "4", "--top-k": "2",
                                      "--moe-intermediate": "32",
                                      "--head-dim": "16"})
        cfg, params = load_hf_model(tmp_path / "ck")
        assert cfg.moe_num_experts == 4 and not cfg.moe_mixtral_names
        assert cfg.qk_norm and cfg.moe_intermediate_ == 32
        lp = params["layers"][0]
        assert lp["mlp.experts.0.gate_proj"].shape == (64, 32)
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert bool(jnp.isfinite(logits).all())

    def test_phi3_fused_checkpoint_roundtrip(self, tmp_path):
        """Phi-3 checkpoint: fused qkv/gate_up tensors split on load."""
        import jax.numpy as jnp

        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.models.loader import load_hf_model

        self._gen(tmp_path / "ck", **{"--model-type": "phi3",
                                      "--sliding-window": "16"})
        cfg, params = load_hf_model(tmp_path / "ck")
        assert cfg.fused_qkv_gate_up
        lp = params["layers"][0]
        assert lp["self_attn.q_proj"].shape == (64, 64)
        assert lp["self_attn.k_proj"].shape == (64, 32)
        assert lp["mlp.up_proj"].shape == (64, 112)
        toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
        logits = L.forward_logits(cfg, params, toks)
        assert bool(jnp.isfinite(logits).all())


class TestServePrefixCache:
    def test_serve_prefix_cache_flag(self, tiny_checkpoint):
        """--prefix-cache on the ragged scheduler: the warmup request's
        prompt equals request 0's, so its full prefix pages hit; stats
        report the hit count."""
        from gptq_v2_tpu.serve import main as serve_main

        tc = tiny_checkpoint
        stats = serve_main([
            "--model-dir", tc["model_dir"], "--results", "",
            "--cache-kind", "paged", "--scheduler", "ragged",
            "--prefix-cache", "true", "--page-size", "8",
            "--max-batch", "2", "--max-seq-len", "64",
            "--bench-tokens", "4", "--prompt-tokens", "20",
        ])
        assert stats["new_tokens"] == 8 and stats["tok_s"] > 0
        # request 0 re-serves the warmup prompt: floor(19/8)=2 pages
        assert stats["prefix_hit_tokens"] == 16
