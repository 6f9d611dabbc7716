"""CLI driver end-to-end: flags → load → quantize → save → resume → eval."""
import json

import numpy as np
import pytest

import jax

from gptq_v2_tpu.data import cache_key
from gptq_v2_tpu.models import llama as L


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """Write a tiny HF-format Llama checkpoint + dataset caches."""
    from safetensors.numpy import save_file

    root = tmp_path_factory.mktemp("cli")
    model_dir = root / "model"
    model_dir.mkdir()
    cfg = L.LlamaConfig.tiny(dtype="float32")
    with open(model_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_hidden_layers,
            "num_attention_heads": cfg.num_attention_heads,
            "num_key_value_heads": cfg.num_key_value_heads,
            "max_position_embeddings": cfg.max_position_embeddings,
            "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": cfg.rope_theta,
            "torch_dtype": "float32", "tie_word_embeddings": False,
        }, f)
    params = L.init_params(cfg, jax.random.key(0))
    flat = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"]),
        "model.norm.weight": np.asarray(params["norm"]),
        "lm_head.weight": np.asarray(params["lm_head"]).T.copy(),
    }
    for i, lp in enumerate(params["layers"]):
        for name, w in lp.items():
            w = np.asarray(w)
            if w.ndim == 2:
                w = w.T.copy()  # HF stores (out, in)
            flat[f"model.layers.{i}.{name}.weight"] = w
    save_file(flat, str(model_dir / "model.safetensors"))

    cache_dir = root / "cache"
    cache_dir.mkdir()
    rng = np.random.default_rng(0)
    seqlen, n_train, n_eval = 32, 4, 4
    for name, split, n in [("c4", "train", n_train),
                           ("wikitext2", "test", n_eval)]:
        toks = rng.integers(0, cfg.vocab_size, (n, seqlen)).astype(np.int64)
        np.savez(cache_dir / f"{cache_key(name, split, seqlen, n, 0)}.npz",
                 tokens=toks)
    return {"model_dir": str(model_dir), "cache_dir": str(cache_dir),
            "root": root, "seqlen": seqlen, "n_train": n_train,
            "n_eval": n_eval, "cfg": cfg}


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
