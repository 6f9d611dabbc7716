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

# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DIR = Path("/root/reference")


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
