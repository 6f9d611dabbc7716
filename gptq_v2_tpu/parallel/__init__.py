"""Multi-device parallelism: mesh construction, tensor-parallel W4A16
serving, data-parallel calibration, pipeline-parallel (layer-stage)
serving.

The reference is strictly single-GPU (SURVEY.md §2 components 22-27 are
ABSENT there); this package provides the TPU-native scale-out mandated by
the north star: a single ``jax.sharding.Mesh`` with ``('data', 'model')``
axes, INT4 weights + paged KV cache sharded over ``model`` via
``shard_map`` (collectives ride ICI), calibration batches sharded over
``data``.  ``parallel/pp.py`` adds GPipe-style layer pipelining over a
``('stage',)`` mesh — the low-bandwidth (DCN-tolerant) scale-out that also
divides weight+KV memory per device.
"""
from gptq_v2_tpu.parallel.mesh import make_mesh
from gptq_v2_tpu.parallel.tp import (
    TPPackedLlama,
    shard_packed_llama,
    build_tp_prefill,
    build_tp_decode_step,
)
from gptq_v2_tpu.parallel.dp import dp_hessian_step
from gptq_v2_tpu.parallel.pp import (
    PPPackedLlama,
    build_pp_decode_step,
    build_pp_prefill,
    make_pp_mesh,
    shard_packed_llama_pp,
)

__all__ = [
    "make_mesh",
    "TPPackedLlama",
    "shard_packed_llama",
    "build_tp_prefill",
    "build_tp_decode_step",
    "dp_hessian_step",
    "PPPackedLlama",
    "build_pp_decode_step",
    "build_pp_prefill",
    "make_pp_mesh",
    "shard_packed_llama_pp",
]
