"""Affine group quantizer math (pure jnp, functional).

Re-implements the semantics of the reference quantizer (reference:
``quant.py:10-183``) in a functional, jit-friendly style:

* asymmetric / symmetric affine quantization over the last axis
  ``q = clamp(round(x / scale) + qzero, 0, maxq)`` / ``x ≈ (q - qzero) * scale``
* EXL2-style quadratic "scale of scales" quantization
  (``qs = clamp(round(sqrt(s / ss)), 1, smaxq + 1)``, ``s = qs² · ss``),
  enabling low-bit storage of per-group scales (reference ``quant.py:40-69``)
* MSE grid search shrinking the scale over ``p ∈ (1 - max_shrink, 1]``
  minimizing ``Σ |q(x;p·s) - x|^norm`` (reference ``quant.py:150-165``)

All functions are shape-polymorphic over leading dims; reductions are along
``axis=-1`` exactly like the reference, so a single call vectorizes over all
rows *and* all groups at once (a TPU-first improvement over the reference's
per-group ``Quantizer`` objects).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

EPSILON = 1e-12  # reference quant.py:7


class QuantParams(NamedTuple):
    """Per-row (or per-row-per-group) quantization parameters.

    Shapes follow the reference convention: for input ``x`` of shape
    ``(..., R, C)``, ``scale``/``qzero`` are ``(..., R, 1)`` and ``maxq`` is a
    scalar.  For the EXL2 format ``qscale`` is ``(..., R, 1)``, ``sscale`` is
    ``(..., 1, 1)`` and ``smaxq`` a scalar.
    """

    scale: jax.Array
    qzero: jax.Array
    maxq: jax.Array
    qscale: Optional[jax.Array] = None
    sscale: Optional[jax.Array] = None
    smaxq: Optional[jax.Array] = None


def quantize(x: jax.Array, scale: jax.Array, qzero: jax.Array, maxq) -> jax.Array:
    """Affine quantize (reference quant.py:10-19). Same dtype as ``x``."""
    return jnp.clip(jnp.round(x / scale) + qzero, 0.0, maxq)


def dequantize(qx: jax.Array, scale: jax.Array, qzero: jax.Array) -> jax.Array:
    """Affine dequantize (reference quant.py:22-30)."""
    return (qx - qzero) * scale


def dequantize_quantized(x, scale, qzero, maxq):
    """Quantize-then-dequantize round trip (reference quant.py:33-37)."""
    return dequantize(quantize(x, scale, qzero, maxq), scale, qzero)


def quantize2(x: jax.Array, scale: jax.Array, maxq) -> jax.Array:
    """Quadratic (EXL2) quantization of positive values, e.g. scales.

    Reference quant.py:40-51.  Stored values are in ``[1, maxq + 1]``.
    """
    return jnp.clip(jnp.round(jnp.sqrt(x / scale)), 1.0, maxq + 1.0)


def dequantize2(qx: jax.Array, scale: jax.Array) -> jax.Array:
    """Quadratic (EXL2) dequantization (reference quant.py:54-62)."""
    return qx * qx * scale


def dequantize2_quantized2(x, scale, maxq):
    """Quadratic round trip (reference quant.py:65-69)."""
    return dequantize2(quantize2(x, scale, maxq), scale)


def find_params(
    x: jax.Array,
    bit_width,
    sym: bool = False,
    scale_bit_width: Optional[int] = None,
) -> QuantParams:
    """Compute per-row quantization parameters over ``axis=-1``.

    Mirrors reference ``Quantizer.find_params`` (quant.py:89-118):

    * asymmetric: ``scale = (relu(max) - (-relu(-min))) / maxq + eps``,
      ``qzero = round(-xmin / scale)``
    * symmetric: ``scale = 2·absmax/maxq + eps``, ``qzero = round((maxq+1)/2)``
    * with ``scale_bit_width``: forces symmetric and quantizes the scales
      quadratically (EXL2), re-deriving ``scale = qscale² · sscale``.
    """
    if scale_bit_width is not None and scale_bit_width > 0:
        sym = True

    maxq = jnp.asarray(2.0 ** float(bit_width) - 1.0, dtype=x.dtype)

    if sym:
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = absmax * (2.0 / maxq) + EPSILON
        qzero = jnp.full_like(scale, jnp.round((maxq + 1.0) * 0.5))
        if scale_bit_width is not None and scale_bit_width > 0:
            smaxq = jnp.asarray(2.0 ** float(scale_bit_width) - 1.0, dtype=x.dtype)
            sscale = jnp.max(scale, axis=-2, keepdims=True) / (smaxq + 1.0) ** 2.0 + EPSILON
            qscale = quantize2(scale, sscale, smaxq)
            scale = dequantize2(qscale, sscale)
            return QuantParams(scale, qzero, maxq, qscale, sscale, smaxq)
        return QuantParams(scale, qzero, maxq)

    x_max = jax.nn.relu(jnp.max(x, axis=-1, keepdims=True))
    x_min = -jax.nn.relu(-jnp.min(x, axis=-1, keepdims=True))
    scale = (x_max - x_min) / maxq + EPSILON
    qzero = jnp.round(-x_min / scale)
    return QuantParams(scale, qzero, maxq)


def mse_refine(
    params: QuantParams,
    x: jax.Array,
    max_shrink: float = 0.8,
    n_grid: int = 100,
    norm: float = 2.4,
) -> QuantParams:
    """Grid-search a shrink factor for the scale minimizing quantization error.

    Mirrors the reference's vectorized-torch MSE path (quant.py:150-165):
    candidates ``p = 1 - arange(0, max_shrink, 1/n_grid)``; pick per row the
    ``p`` minimizing ``Σ_C |deq(quant(x; p·s)) - x|^norm``; for the EXL2
    format re-fit and grid-search the scale-of-scales too.
    """
    p = 1.0 - jnp.arange(0.0, max_shrink, 1.0 / n_grid, dtype=x.dtype)  # (Q,)
    # maxq may carry per-group leading dims; align it with the added grid axis
    maxq_b = params.maxq if jnp.ndim(params.maxq) == 0 else params.maxq[..., None]
    q = dequantize_quantized(
        x[..., None], params.scale[..., None] * p, params.qzero[..., None], maxq_b
    )  # (..., R, C, Q)
    err = jnp.sum(jnp.abs(q - x[..., None]) ** norm, axis=-2)  # (..., R, Q)
    err_argmin = jnp.argmin(err, axis=-1, keepdims=True)  # (..., R, 1)
    scale = params.scale * jnp.take(p, err_argmin)

    if params.sscale is None:
        return params._replace(scale=scale)

    smaxq = params.smaxq
    sscale = jnp.max(scale, axis=-2, keepdims=True) / (smaxq + 1.0) ** 2.0 + EPSILON
    q2 = dequantize2_quantized2(scale[..., None], sscale[..., None] * p, smaxq)  # (..., R, 1, Q)
    err2_argmin = jnp.argmin(
        jnp.sum(jnp.abs(q2 - scale[..., None]) ** norm, axis=-3), axis=-1, keepdims=True
    )  # (..., 1, 1)
    sscale = sscale * jnp.take(p, err2_argmin)
    qscale = quantize2(scale, sscale, smaxq)
    scale = dequantize2(qscale, sscale)
    return params._replace(scale=scale, qscale=qscale, sscale=sscale)


def params_quantize(params: QuantParams, x: jax.Array) -> jax.Array:
    return quantize(x, params.scale, params.qzero, params.maxq)


def params_dequantize(params: QuantParams, qx: jax.Array) -> jax.Array:
    return dequantize(qx, params.scale, params.qzero)


# ---------------------------------------------------------------------------
# Reconstruction from packed quant_meta (reference quant.py:222-279)
# ---------------------------------------------------------------------------


def _group_scales_to_columns(per_group: jax.Array, group_sizes) -> jax.Array:
    """Expand per-group values ``(..., G)`` to per-column ``(..., C)``."""
    group_sizes = [int(g) for g in group_sizes]
    reps = jnp.concatenate(
        [jnp.full((g,), k, dtype=jnp.int32) for k, g in enumerate(group_sizes)]
    )
    return jnp.take(per_group, reps, axis=-1)


def construct_matrix(
    qweight: jax.Array,  # (R, C) integer codes
    scale: jax.Array,  # (R, G)
    qzero: jax.Array,  # (R, G) or broadcastable
    group_sizes,  # (G,) python ints / array
    out_dtype=None,
) -> jax.Array:
    """Rebuild a float weight matrix from linear quant metadata.

    Reference ``construct_matrix`` (quant.py:222-237) loops groups; here we
    expand group params to columns and dequantize in one shot.
    """
    out_dtype = out_dtype or scale.dtype
    qzero = jnp.broadcast_to(qzero, scale.shape)
    scale_c = _group_scales_to_columns(scale.astype(jnp.float32), group_sizes)
    qzero_c = _group_scales_to_columns(qzero.astype(jnp.float32), group_sizes)
    w = (qweight.astype(jnp.float32) - qzero_c) * scale_c
    return w.astype(out_dtype)


def construct_matrix_2(
    qweight: jax.Array,  # (R, C) integer codes
    qzero: jax.Array,  # (R, G) or broadcastable
    qscale: jax.Array,  # (R, G) integer codes
    sscale: jax.Array,  # (G,) or (1, G)
    group_sizes,
    out_dtype=None,
) -> jax.Array:
    """Rebuild a float weight matrix from EXL2 quant metadata.

    Reference ``construct_matrix_2`` (quant.py:240-259): per-group scale is
    itself quadratically dequantized as ``qscale² · sscale``.
    """
    out_dtype = out_dtype or sscale.dtype
    sscale = jnp.reshape(sscale, (1, -1)).astype(jnp.float32)
    qs = qscale.astype(jnp.float32)
    scale = dequantize2(qs, sscale)  # (R, G)
    return construct_matrix(qweight, scale, qzero, group_sizes, out_dtype=out_dtype)


def reconstruct_weight(quant_meta: dict, out_dtype=jnp.float32) -> jax.Array:
    """Rebuild the dense ``(R, C)`` weight from a ``quant_meta`` dict,
    applying the inverse act-order permutation.

    Reference ``reconstruct_nn_linear`` (quant.py:262-279), minus the torch
    module wrapper — our models are functional so a dense array suffices.
    """
    qweight = quant_meta["qweight"]
    qzero = quant_meta["qzero"]
    group_sizes = quant_meta["group_sizes"]
    if quant_meta.get("sscale") is not None:
        w = construct_matrix_2(
            qweight, qzero, quant_meta["qscale"], quant_meta["sscale"], group_sizes,
            out_dtype=out_dtype,
        )
    else:
        w = construct_matrix(
            qweight, quant_meta["scale"], qzero, group_sizes, out_dtype=out_dtype
        )
    perm_inv = quant_meta.get("perm_inv")
    if perm_inv is not None:
        w = jnp.take(w, perm_inv.astype(jnp.int32), axis=-1)
    return w.astype(out_dtype)
