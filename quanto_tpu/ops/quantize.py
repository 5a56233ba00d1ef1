"""Core quantization ops.

TPU-native equivalents of the reference op library
(`optimum/quanto/library/quantize.py:22-78`). These are pure jnp functions:
under jit XLA fuses the scale/round/clamp chains into single VPU passes, which
replaces the reference's per-backend `torch.library` dispatch entirely.

Rounding matches torch: round-half-to-even (jnp.round == torch.round).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..tensor.grouped import group
from ..tensor.qtype import qtype


__all__ = ["quantize_symmetric", "quantize_affine", "dequantize_symmetric", "dequantize_affine"]


def _check_per_axis_scale(base_ndim: int, base_shape, axis: Optional[int], scale: jnp.ndarray):
    if axis is None:
        if scale.ndim > 0 and scale.size != 1:
            raise ValueError("Scale must be a scalar when quantizing per-tensor")
        return
    if base_ndim == 1:
        raise ValueError("1D Tensors cannot be quantized per-axis")
    if axis not in (0, -1, base_ndim - 1):
        raise ValueError("Quantization is only supported along the first or last axis.")
    if base_shape[axis] == 1:
        raise ValueError(f"Cannot quantize Tensor of shape {base_shape} along axis {axis} of size 1")
    if sum(1 for d in scale.shape if d > 1) > 1:
        raise ValueError("Quantizing along multiple axis is not supported")
    if scale.ndim != base_ndim:
        raise ValueError(
            "When quantizing per-axis, the scale must be broadcastable to the base "
            "(Tip: try to add missing dims of length one)."
        )


def quantize_symmetric(
    base: jnp.ndarray, qt: qtype, axis: Optional[int], scale: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric quantization: clamp(round(base / scale)) cast to the storage dtype.

    For float8 qtypes no rounding is applied (the fp8 cast rounds).
    Mirrors `quanto::quantize_symmetric` (reference `library/quantize.py:27-55`).
    """
    scale = jnp.asarray(scale)
    _check_per_axis_scale(base.ndim, base.shape, axis, scale)
    data = base.astype(jnp.float32) / scale.astype(jnp.float32)
    if not qt.is_floating_point:
        data = jnp.round(data)
    data = jnp.clip(data, qt.qmin, qt.qmax)
    return data.astype(qt.dtype)


def quantize_affine(
    base: jnp.ndarray,
    bits: int,
    axis: int,
    group_size: Optional[int],
    scale: jnp.ndarray,
    shift: jnp.ndarray,
) -> jnp.ndarray:
    """Affine (asymmetric) quantization to unsigned codes in [0, 2**bits - 1].

    A floating-point `shift` is a pre-scale offset (`round((base + shift) / scale)`);
    an integer `shift` is a zero-point added post-scale (`round(base / scale) + shift`).
    Mirrors `quanto::quantize_affine` (reference `library/quantize.py:64-78`).
    """
    if axis not in (0, -1):
        raise ValueError("axis parameter must be 0 (first axis) or -1 (last axis)")
    if group_size is not None:
        base = group(base, axis=axis, group_size=group_size)
    base = base.astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(shift).dtype, jnp.floating):
        data = jnp.round((base + shift.astype(jnp.float32)) / scale.astype(jnp.float32))
    else:
        data = jnp.round(base / scale.astype(jnp.float32)) + shift
    return jnp.clip(data, 0, 2**bits - 1).astype(jnp.uint8)


def dequantize_symmetric(
    data: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Inverse of `quantize_symmetric`: scale * data, in `dtype`."""
    return (data.astype(jnp.float32) * jnp.asarray(scale).astype(jnp.float32)).astype(dtype)


def dequantize_affine(
    data: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Inverse of `quantize_affine` on grouped codes (caller un-groups)."""
    data = data.astype(jnp.float32)
    scale = jnp.asarray(scale).astype(jnp.float32)
    if jnp.issubdtype(jnp.asarray(shift).dtype, jnp.floating):
        out = scale * data - shift.astype(jnp.float32)
    else:
        # Integer zero-point.
        out = scale * (data - shift.astype(jnp.float32))
    return out.astype(dtype)
