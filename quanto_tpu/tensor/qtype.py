"""Quantized type descriptors.

TPU-native analogue of the reference qtype system
(`optimum/quanto/tensor/qtype.py:20-72`): a dtype-like descriptor carrying the
name, bit-width, storage dtype and representable range of a quantization
target. Integer qtypes (qint2/qint4/qint8) use signed ranges and an int8
storage dtype (sub-byte values are bit-packed separately, see
`quanto_tpu.tensor.packed`); float8 qtypes map onto JAX's native fp8 dtypes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class qtype:
    """A quantized type descriptor mimicking a jnp dtype."""

    name: str
    is_floating_point: bool
    bits: int
    # The dtype used to store (unpacked) quantized values.
    dtype: jnp.dtype
    qmin: float
    qmax: float

    def __str__(self):
        return f"quanto.{self.name}"

    def __hash__(self):
        return hash(str(self))


def qint(bits: int) -> qtype:
    """Signed integer qtype of the given bit-width (storage: int8)."""
    qmin = -(2 ** (bits - 1))
    qmax = 2 ** (bits - 1) - 1
    return qtype(
        f"qint{bits}", is_floating_point=False, bits=bits, dtype=jnp.int8, qmin=qmin, qmax=qmax
    )


qint2 = qint(2)
qint4 = qint(4)
qint8 = qint(8)


def qfloat(dtype) -> qtype:
    """Float8 qtype backed by a native JAX fp8 dtype."""
    finfo = jnp.finfo(dtype)
    qmin = float(finfo.min)
    qmax = float(finfo.max)
    return qtype(
        f"qfloat8_{np.dtype(dtype).name.split('float8_')[-1]}",
        is_floating_point=True,
        bits=8,
        dtype=jnp.dtype(dtype),
        qmin=qmin,
        qmax=qmax,
    )


qfloat8_e4m3fn = qfloat(jnp.float8_e4m3fn)
qfloat8_e4m3fnuz = qfloat(jnp.float8_e4m3fnuz)
qfloat8_e5m2 = qfloat(jnp.float8_e5m2)

# Alias the float8 representation with the best TPU support / inference efficiency.
qfloat8 = qfloat8_e4m3fn

# Convenience dict to look a qtype up by name (mirrors reference `qtypes`).
qtypes = {name: q for (name, q) in dict(locals()).items() if isinstance(q, qtype)}
# The reference exposes the alias under the canonical e4m3fn name as well.
qtypes["qfloat8"] = qfloat8

__all__ = ["qtype", "qtypes", "qint", "qfloat"] + [n for n in qtypes]
