"""Small shared runtime utilities: compile cache, profiling, phase timers.

The reference's only observability is ``time.time()`` wall-clocks and tqdm
(reference ``main.py:33-35``, ``llama.py:90,201-202``; SURVEY.md §5.1).
Here the same per-phase wall-clocks are first-class (:class:`PhaseTimer`)
and full ``jax.profiler`` device traces are one flag away
(:func:`profile_trace` — ``--profile-dir`` on the CLIs), viewable in
TensorBoard/Perfetto/XProf.
"""
from __future__ import annotations

import contextlib
import os
import tempfile
import time
from typing import Dict


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent XLA compilation cache.

    Block-0 of a quantization run pays every jit compile in the pipeline —
    measured ~2.5 min for the D=4096 Hessian invert alone on the tunneled
    v5e (remote compile).  The reference has no analogous cost (CUDA kernels
    ship precompiled); caching compiles across runs is the TPU equivalent.
    Override the location with ``GPTQ_V2_TPU_XLA_CACHE``.
    """
    import jax

    env = os.environ.get("GPTQ_V2_TPU_XLA_CACHE")
    if env in ("0", "off"):
        # explicit opt-out (tests/conftest.py: XLA-CPU executable
        # (de)serialization segfaults in long processes on some hosts)
        return
    if cache_dir is None and jax.config.jax_compilation_cache_dir:
        # already configured by the embedder; don't override its policy
        return
    cache_dir = (cache_dir or env
                 or os.path.join(tempfile.gettempdir(), "gptq_v2_tpu_xla_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def profile_trace(trace_dir: str | None):
    """Capture a ``jax.profiler`` device trace under ``trace_dir``.

    No-op when ``trace_dir`` is falsy, so call sites can thread a CLI flag
    straight through.  The trace records every XLA program, kernel, and
    host-device transfer in the block — open with TensorBoard's profile
    plugin or Perfetto.
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class PhaseTimer:
    """Named wall-clock phases (load / calibrate / quantize / eval / ...).

    ``with timer("quantize"): ...`` accumulates; :meth:`summary` returns the
    ``{phase: seconds}`` dict for logging.  Phases nest; each phase also
    opens a ``jax.profiler.TraceAnnotation`` so device traces captured via
    :func:`profile_trace` show the phase spans on the host timeline.
    """

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, phase: str):
        import jax

        t0 = time.time()
        with jax.profiler.TraceAnnotation(phase):
            yield
        self.seconds[phase] = self.seconds.get(phase, 0.0) + time.time() - t0

    def summary(self) -> Dict[str, float]:
        return {k: round(v, 3) for k, v in self.seconds.items()}
