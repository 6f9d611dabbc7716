"""Test env: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Must set flags before the first `import jax` anywhere in the test session.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
import types
from pathlib import Path

import pytest

import jax

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; config.update after import wins. Tests must run on CPU —
# f32 matmuls on the TPU backend demote to bf16 at default precision.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: OFF by default.  XLA-CPU executable
# (de)serialization segfaults nondeterministically in LONG test processes
# on this host (observed 4x: put_executable_and_time / get_executable_and
# _time, always >10 min into a full-suite run, never in short per-module
# processes — the same entries read/write fine there).  Opt back in for
# fast per-module dev iteration with GPTQ_TEST_XLA_CACHE=1; never enable
# it for the full suite.
if os.environ.get("GPTQ_TEST_XLA_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    # also stop the CLI entry points under test from re-enabling it
    os.environ["GPTQ_V2_TPU_XLA_CACHE"] = "0"

REFERENCE_DIR = Path("/root/reference")


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_memory():
    """Drop compiled executables at each module boundary.

    XLA-CPU keeps LLVM-JIT code mappings alive per compiled executable; a
    full-suite process accumulates enough to cross ``vm.max_map_count``
    (~65k) and segfaults — always near the same late test, in whichever
    allocation-heavy path runs there (observed in compile, cache
    serialize, AND cache deserialize; per-module processes never crash).
    Clearing per module keeps the map count bounded; cross-module
    recompiles are cheap at test shapes."""
    yield
    with open("/proc/self/maps") as f:
        n_maps = sum(1 for _ in f)
    with open("/tmp/jax_test_mapcount.log", "a") as f:
        f.write(f"{n_maps}\n")
    jax.clear_caches()


@pytest.fixture(scope="session")
def tiny_checkpoint(tmp_path_factory):
    """Tiny HF-format Llama checkpoint + pre-seeded dataset caches."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from gptq_v2_tpu.data import cache_key
    from gptq_v2_tpu.models import llama as L

    root = tmp_path_factory.mktemp("ckpt")
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


@pytest.fixture(scope="session")
def reference_modules():
    """Import the upstream reference's pure-Python modules as a parity oracle.

    The reference's CUDA/Triton imports are stubbed out; only the
    pure-torch code paths (``use_kernel=False`` everywhere) are exercised.
    Skipped when the reference checkout is not present (CI elsewhere).
    """
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")

    def _unavailable(*args, **kwargs):
        raise RuntimeError("CUDA/Triton kernels are not available in tests")

    gptq_stub = types.ModuleType("gptq")
    gptq_stub.accumulate_hessian = _unavailable
    gptq_stub.gptq_quantize_range = _unavailable
    triton_pkg = types.ModuleType("gptq_triton")
    triton_mod = types.ModuleType("gptq_triton.accumulate_hessian")
    triton_mod.accumulate_hessian = _unavailable
    triton_pkg.accumulate_hessian = triton_mod

    saved = {}
    for name, mod in [
        ("gptq", gptq_stub),
        ("gptq_triton", triton_pkg),
        ("gptq_triton.accumulate_hessian", triton_mod),
    ]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod

    sys.path.insert(0, str(REFERENCE_DIR))
    try:
        import quant as ref_quant  # noqa: F401
        import gptq_py as ref_gptq  # noqa: F401

        yield types.SimpleNamespace(quant=ref_quant, gptq=ref_gptq)
    finally:
        sys.path.remove(str(REFERENCE_DIR))
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
