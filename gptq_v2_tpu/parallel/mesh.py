"""Device-mesh construction.

One mesh for the whole framework, axes ``('data', 'model')``:

* ``data``  — batch/data parallelism (calibration forward passes, eval,
  independent serving replicas).  Collectives over this axis are a single
  psum per Hessian stage, so it is the axis to place across DCN when
  running multi-host.
* ``model`` — tensor parallelism (packed INT4 weights, KV-cache heads).
  Per-token all-gathers/psums ride this axis every block, so it must stay
  on ICI within a host/pod-slice.

``jax.distributed.initialize()`` (multi-host) composes transparently:
``jax.devices()`` then spans all hosts and the same mesh code shards
globally.  The reference has no analogue (single GPU, SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data=dp, model=tp)`` mesh.

    ``tp`` defaults to all remaining devices after ``dp``.  Device order
    keeps ``model`` innermost so TP collectives map to adjacent ICI
    neighbours on real slices.
    """
    if devices is None:
        devices = jax.devices()
    if tp is None:
        tp = max(1, len(devices) // dp)
    n = dp * tp
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    grid = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def dp_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry point: wire this process into a JAX cluster.

    Call BEFORE any device use.  On TPU pods the three arguments may all be
    ``None`` (auto-detected from the TPU environment); elsewhere pass the
    coordinator ``host:port`` plus the process count/id (e.g. from
    ``serve.py --coordinator ... --num-processes N --process-id i``).

    On the CPU backend the gloo collectives transport is enabled so
    cross-process psum/all-gather work — which is also how the multi-host
    code paths are tested without a pod
    (``tests/test_multihost.py``: N local processes, each with
    ``--xla_force_host_platform_device_count`` virtual devices).

    Returns True if a multi-process cluster was initialized.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    # NB: only config reads here — touching jax.devices()/default_backend()
    # would initialize the backend before the cluster exists
    if "cpu" in str(getattr(jax.config, "jax_platforms", None) or ""):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return jax.process_count() > 1


def make_dcn_mesh(
    tp: Optional[int] = None,
    dp: Optional[int] = None,
) -> Mesh:
    """DCN-aware ``(data, model)`` mesh for multi-host clusters.

    Placement policy (SURVEY §5.8 / the scaling-book recipe): the
    ``model`` (TP) axis carries per-token collectives every block, so it
    must stay WITHIN a host's devices (ICI on a pod slice); the ``data``
    axis sees one psum per calibration stage / independent serving
    replicas, so it spans hosts (DCN-tolerant).  Devices are grouped by
    ``process_index`` to guarantee that layout regardless of global
    enumeration order.

    Defaults: ``tp`` = devices per host, ``dp`` = host count.
    """
    devices = jax.devices()
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    n_hosts = len(by_proc)
    per_host = min(len(v) for v in by_proc.values())
    if tp is None:
        tp = per_host
    if dp is None:
        dp = (n_hosts * per_host) // tp
    assert tp * dp <= n_hosts * per_host, (tp, dp, n_hosts, per_host)
    assert tp <= per_host or dp == 1, (
        f"model axis (tp={tp}) must not cross hosts (per_host={per_host}):"
        " per-token collectives would ride DCN")
    rows = []
    flat = [d for p in sorted(by_proc) for d in by_proc[p]]
    for i in range(dp):
        rows.append(flat[i * tp:(i + 1) * tp])
    return Mesh(np.asarray(rows), (DATA_AXIS, MODEL_AXIS))
