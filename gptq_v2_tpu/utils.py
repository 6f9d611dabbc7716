"""Small shared runtime utilities."""
from __future__ import annotations

import os
import tempfile


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent XLA compilation cache.

    Block-0 of a quantization run pays every jit compile in the pipeline —
    measured ~2.5 min for the D=4096 Hessian invert alone on the tunneled
    v5e (remote compile).  The reference has no analogous cost (CUDA kernels
    ship precompiled); caching compiles across runs is the TPU equivalent.
    Override the location with ``GPTQ_V2_TPU_XLA_CACHE``.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("GPTQ_V2_TPU_XLA_CACHE")
                 or os.path.join(tempfile.gettempdir(), "gptq_v2_tpu_xla_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
