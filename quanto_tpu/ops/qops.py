"""Ops on quantized activations that preserve quantization where safe.

Functional analogue of the reference's ATen dispatch table
(`optimum/quanto/tensor/activations/qbytes_ops.py:31-284`): in torch, tensor
subclasses intercept ops; in JAX, model code calls these functions explicitly
on `ActivationQBytesArray` values. Each op either:
- stays in the quantized domain when numerically safe (same rules as the
  reference: shape ops reindex `_data`; scalar `mul` folds into the scale;
  `cat` requires identical scales; `relu` is int-only; `softmax` requantizes
  with the known output range scale 1/qmax), or
- falls back to dequantize-and-compute (`qfallback`).

Plain jnp arrays pass through unchanged, so model code can be
quantization-agnostic.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..tensor.activations import ActivationQBytesArray, quantize_activation
from ..tensor.qarray import QArray, qfallback
from ..tensor.qtype import qtype


__all__ = [
    "qtranspose",
    "qreshape",
    "qcat",
    "qstack",
    "qsplit",
    "qslice",
    "qselect",
    "qexpand",
    "qwhere",
    "qmul_scalar",
    "qdiv_scalar",
    "qneg",
    "qlt",
    "qrelu",
    "qsoftmax",
    "qmatmul",
    "dequantize",
]


def _rewrap(x: ActivationQBytesArray, data: jnp.ndarray) -> ActivationQBytesArray:
    from ..tensor.activations import mark_quantized_use

    mark_quantized_use(x)
    return ActivationQBytesArray(
        _data=data, _scale=x._scale, qtype=x.qtype, float_dtype=x.float_dtype
    )


def dequantize(x):
    return x.dequantize() if isinstance(x, QArray) else x


def qtranspose(x, axes=None):
    """Shape ops reindex the payload (reference `qbytes_ops.py` transpose/t)."""
    if not isinstance(x, ActivationQBytesArray):
        return jnp.transpose(x, axes)
    return _rewrap(x, jnp.transpose(x._data, axes))


def qreshape(x, shape):
    if not isinstance(x, ActivationQBytesArray):
        return jnp.reshape(x, shape)
    return _rewrap(x, jnp.reshape(x._data, shape))


def qcat(xs: Sequence, axis: int = 0):
    """Concatenate; stays quantized only when all inputs share scale & qtype
    (reference `qbytes_ops.py:93-104`)."""
    xs = list(xs)
    if _same_quantization(xs):
        return _rewrap(xs[0], jnp.concatenate([x._data for x in xs], axis=axis))
    return jnp.concatenate([dequantize(x) for x in xs], axis=axis)


def _same_quantization(xs: Sequence) -> bool:
    """True when all inputs share qtype and (concretely) equal scales.

    Under jit the scales are tracers whose values are unknown at trace time;
    we conservatively answer False there (the dequantize path is always
    correct), instead of raising a trace-time concretization error."""
    if not xs or not all(isinstance(x, ActivationQBytesArray) for x in xs):
        return False
    first = xs[0]
    if not all(
        x.qtype == first.qtype and x._scale.shape == first._scale.shape for x in xs[1:]
    ):
        return False
    if any(isinstance(x._scale, jax.core.Tracer) for x in xs):
        return len(xs) == 1 or all(x._scale is first._scale for x in xs[1:])
    return all(bool(jnp.all(x._scale == first._scale)) for x in xs[1:])


def qstack(xs: Sequence, axis: int = 0):
    """Stack along a new axis; stays quantized when scales/qtypes agree
    (reference `qbytes_ops.py` stack)."""
    if _same_quantization(list(xs)):
        return _rewrap(xs[0], jnp.stack([x._data for x in xs], axis=axis))
    return jnp.stack([dequantize(x) for x in xs], axis=axis)


def qsplit(x, indices_or_sections, axis: int = 0):
    """Split reindexes the payload per part (reference `qbytes_ops.py` split)."""
    if not isinstance(x, ActivationQBytesArray):
        return jnp.split(x, indices_or_sections, axis=axis)
    return [_rewrap(x, part) for part in jnp.split(x._data, indices_or_sections, axis=axis)]


def qslice(x, idx):
    """Payload indexing/slicing — the analogue of the reference's
    select/slice/unsqueeze ATen handlers (`qbytes_ops.py`): per-tensor scale
    is position-independent, so any indexing of the codes is exact."""
    if not isinstance(x, ActivationQBytesArray):
        return x[idx]
    return _rewrap(x, x._data[idx])


def qselect(x, axis: int, index: int):
    """Select one index along an axis (reference `qbytes_ops.py` select)."""
    if not isinstance(x, ActivationQBytesArray):
        return jnp.take(x, index, axis=axis)
    return _rewrap(x, jnp.take(x._data, index, axis=axis))


def qexpand(x, shape):
    """Broadcast to a larger shape (reference `qbytes_ops.py` expand)."""
    if not isinstance(x, ActivationQBytesArray):
        return jnp.broadcast_to(x, shape)
    return _rewrap(x, jnp.broadcast_to(x._data, shape))


def qwhere(cond, a, b):
    """Element select; stays quantized when both branches share quantization
    (scale-exactness rule as `qcat`), otherwise dequantizes (the reference
    routes mixed cases through `qfallback`)."""
    if _same_quantization([a, b]):
        return _rewrap(a, jnp.where(cond, a._data, b._data))
    return jnp.where(cond, dequantize(a), dequantize(b))


def qmul_scalar(x, scalar):
    """Multiply by a python/0-d scalar: folds into the scale
    (reference `qbytes_ops.py:mul`)."""
    if not isinstance(x, ActivationQBytesArray):
        return x * scalar
    s = jnp.asarray(scalar)
    if s.ndim != 0:
        return qfallback(jnp.multiply, x, scalar)
    return ActivationQBytesArray(
        _data=x._data,
        _scale=(x._scale.astype(jnp.float32) * s.astype(jnp.float32)).astype(x._scale.dtype),
        qtype=x.qtype,
        float_dtype=x.float_dtype,
    )


def qdiv_scalar(x, scalar):
    """Divide by a python/0-d scalar: folds into the scale
    (reference `qbytes_ops.py:div`)."""
    if not isinstance(x, ActivationQBytesArray):
        return x / scalar
    s = jnp.asarray(scalar)
    if s.ndim != 0:
        return qfallback(jnp.divide, x, scalar)
    return ActivationQBytesArray(
        _data=x._data,
        _scale=(x._scale.astype(jnp.float32) / s.astype(jnp.float32)).astype(x._scale.dtype),
        qtype=x.qtype,
        float_dtype=x.float_dtype,
    )


def qneg(x):
    """Negate integer codes in place (reference `qbytes_ops.py:neg`; fp8
    codes are sign-magnitude, not two's-complement, so they dequantize).
    The symmetric int range is asymmetric at qmin (-128 for int8): clamp the
    negated qmin code to qmax, matching quantize's saturation."""
    if not isinstance(x, ActivationQBytesArray) or x.qtype.is_floating_point:
        return jnp.negative(dequantize(x))
    d = x._data
    qmin = -(2 ** (x.qtype.bits - 1))
    qmax = 2 ** (x.qtype.bits - 1) - 1
    neg = jnp.where(d == qmin, jnp.asarray(qmax, d.dtype), (-d.astype(jnp.int32)).astype(d.dtype))
    return _rewrap(x, neg)


def qlt(a, b):
    """Elementwise `<`; compares integer codes directly when both sides share
    quantization (positive scale preserves order — reference
    `qbytes_ops.py:lt`), else compares dequantized values."""
    if _same_quantization([a, b]) and not a.qtype.is_floating_point:
        return a._data < b._data
    return dequantize(a) < dequantize(b)


def qrelu(x):
    """ReLU on integer payloads keeps codes (reference `qbytes_ops.py:relu`,
    int-only — fp8 codes are not monotonic in the integer domain)."""
    if not isinstance(x, ActivationQBytesArray) or x.qtype.is_floating_point:
        return jax.nn.relu(dequantize(x))
    return _rewrap(x, jnp.maximum(x._data, 0))


def qsoftmax(x, axis: int = -1, qt: qtype = None):
    """Softmax with requantization at the known output scale 1/qmax
    (reference `qbytes_ops.py:_softmax`: output in [0, 1])."""
    if not isinstance(x, ActivationQBytesArray):
        return jax.nn.softmax(x, axis=axis)
    qt = qt or x.qtype
    out = jax.nn.softmax(x.dequantize(), axis=axis)
    scale = jnp.float32(1.0 / qt.qmax)
    return quantize_activation(out, qt, scale)


def qmatmul(a, b):
    """int8 x int8 matmul keeps int32->requantizable output
    (reference bmm path, `qbytes_ops.py:76-90`: int8 via fp32 mm)."""
    if (
        isinstance(a, ActivationQBytesArray)
        and isinstance(b, ActivationQBytesArray)
        and not a.qtype.is_floating_point
        and not b.qtype.is_floating_point
    ):
        from ..tensor.activations import mark_quantized_use

        mark_quantized_use(a)
        mark_quantized_use(b)
        prod = jnp.matmul(a._data, b._data, preferred_element_type=jnp.int32)
        scale = a._scale.astype(jnp.float32) * b._scale.astype(jnp.float32)
        return (prod.astype(jnp.float32) * scale).astype(a.float_dtype)
    return jnp.matmul(dequantize(a), dequantize(b))
