"""Sub-byte bit packing / unpacking.

TPU-native replacement for the reference's pack helper + per-device native
unpack kernels (`optimum/quanto/tensor/packed.py:24-69`,
`library/extensions/{cpp/unpack.cpp,cuda/unpack.cu,...}`).

The *serialized* layout is kept bit-compatible with the reference so that
quanto-saved checkpoints can be loaded directly: int4/int2 values are packed
along axis 0 into uint8, where the value at row `i * row_dim + r` occupies
bits `[bits*i, bits*(i+1))` of the byte at row `r` (`row_dim = ceil(rows /
(8 // bits))`).

On TPU these are pure VPU bit-twiddles; XLA compiles the shift/mask pattern to
vectorized ops, so no hand-written kernel is needed for the cold path. Hot
paths (decode-time fused dequant-matmul) unpack inside the Pallas kernel
instead (see `quanto_tpu.ops.pallas`).
"""

from __future__ import annotations

import jax.numpy as jnp


__all__ = ["pack_weights", "unpack_weights"]


def pack_weights(intweights: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack int4/int2 values (stored in uint8/int8) into a uint8 tensor along axis 0."""
    if bits not in (2, 4):
        raise ValueError(f"Can only pack 2- or 4-bit values, got {bits}")
    unpacked = intweights.astype(jnp.uint8)
    original_shape = unpacked.shape
    values_per_item = 8 // bits
    row_dim = (original_shape[0] + values_per_item - 1) // values_per_item

    pad_rows = row_dim * values_per_item - original_shape[0]
    if pad_rows:
        pad_width = [(0, pad_rows)] + [(0, 0)] * (unpacked.ndim - 1)
        unpacked = jnp.pad(unpacked, pad_width)

    # (values_per_item, row_dim, *rest): plane i holds rows [i*row_dim, (i+1)*row_dim)
    planes = unpacked.reshape(values_per_item, row_dim, *original_shape[1:])
    packed = planes[0]
    for i in range(1, values_per_item):
        packed = packed | (planes[i] << (bits * i))
    return packed


def unpack_weights(packed: jnp.ndarray, bits: int, orig_rows: int | None = None) -> jnp.ndarray:
    """Unpack a uint8 tensor produced by `pack_weights` back to per-value uint8.

    If `orig_rows` is given, the result is truncated to that many rows (the
    packed form may carry padding when the original row count was not a
    multiple of `8 // bits`).
    """
    if bits not in (2, 4):
        raise ValueError(f"Can only unpack 2- or 4-bit values, got {bits}")
    packed = packed.astype(jnp.uint8)
    values_per_item = 8 // bits
    mask = jnp.uint8(2**bits - 1)
    planes = [(packed >> (bits * i)) & mask for i in range(values_per_item)]
    unpacked = jnp.concatenate(planes, axis=0)
    if orig_rows is not None:
        unpacked = unpacked[:orig_rows]
    return unpacked
