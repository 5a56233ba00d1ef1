"""Group-wise reshaping for grouped quantization.

Semantics match the reference (`optimum/quanto/tensor/grouped.py:10-51`): a
tensor quantized along `axis` with `group_size` is reshaped so that each group
occupies one row (axis 0) or one column (axis -1), allowing per-group scales
with standard per-axis broadcasting.

These are pure jnp reshapes/transposes — inside jit XLA compiles them to
layout changes, so they are free to use on the non-hot path. Hot kernels
(Pallas fused dequant-matmul) consume pre-grouped packed data directly.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


__all__ = ["group", "ungroup", "grouped_shape"]


def grouped_shape(shape: Sequence[int], axis: int, group_size: int) -> Tuple[int, ...]:
    if axis not in (0, -1):
        raise ValueError("Axis must be 0 or -1 for group-wise quantization")
    n_groups = math.prod(shape) // group_size
    return (n_groups, group_size) if axis == 0 else (group_size, n_groups)


def group(base: jnp.ndarray, axis: int, group_size: int) -> jnp.ndarray:
    if axis not in (0, -1):
        raise ValueError("Axis must be 0 or -1 for group-wise quantization")
    # Standard per-axis quantization has one scale per item along `axis`,
    # evaluated over `axis_numel` elements. Group-wise quantization splits
    # those elements into groups of `group_size`.
    axis_dim = base.shape[axis]
    axis_numel = base.size // axis_dim
    if group_size > axis_numel or axis_numel % group_size != 0:
        raise ValueError(f"Group size ({group_size}) must be a divisor of ({axis_numel})")
    axis_groups = axis_numel // group_size
    if axis == 0:
        return base.reshape(-1, group_size)
    # axis == -1: produce (group_size, axis_dim * axis_groups) so each column
    # is one group of one output feature.
    grouped = base.reshape(axis_groups, group_size, axis_dim)
    grouped = jnp.transpose(grouped, (1, 2, 0))
    return grouped.reshape(group_size, axis_dim * axis_groups)


def ungroup(grouped: jnp.ndarray, axis: int, orig_shape: Sequence[int]) -> jnp.ndarray:
    orig_shape = tuple(orig_shape)
    if tuple(grouped.shape) == orig_shape:
        return grouped
    if axis == 0:
        return grouped.reshape(orig_shape)
    group_size = grouped.shape[0] if axis == -1 else grouped.shape[-1]
    axis_dim = orig_shape[axis]
    axis_groups = grouped.size // axis_dim // group_size
    ungrouped = grouped.reshape(group_size, axis_dim, axis_groups)
    ungrouped = jnp.transpose(ungrouped, (2, 0, 1))
    return ungrouped.reshape(orig_shape)
