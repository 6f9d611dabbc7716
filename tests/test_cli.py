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
