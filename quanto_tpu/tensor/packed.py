"""PackedArray: bit-packed sub-byte integer payloads.

Functional analogue of the reference `PackedTensor`
(`optimum/quanto/tensor/packed.py:72-163`): wraps a uint8 array holding
int4/int2 codes packed along axis 0, remembering the logical (unpacked)
shape. The packed byte layout is bit-identical to the reference so that
serialized checkpoints interoperate.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.pack import pack_weights, unpack_weights
from .qarray import register_qarray


__all__ = ["PackedArray"]


@register_qarray
class PackedArray:
    _data: jnp.ndarray  # uint8, packed along axis 0
    bits: int
    orig_shape: Tuple[int, ...]

    @classmethod
    def pack(cls, t: jnp.ndarray, bits: int = 4) -> "PackedArray":
        if bits not in (2, 4):
            raise ValueError(f"PackedArray supports 2 or 4 bits, got {bits}")
        data = pack_weights(t, bits)
        return cls(_data=data, bits=bits, orig_shape=tuple(t.shape))

    def unpack(self) -> jnp.ndarray:
        return unpack_weights(self._data, self.bits, self.orig_shape[0])

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.orig_shape

    @property
    def ndim(self) -> int:
        return len(self.orig_shape)

    @property
    def dtype(self):
        return jnp.uint8

    @property
    def packed_data(self) -> jnp.ndarray:
        return self._data
