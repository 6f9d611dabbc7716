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
