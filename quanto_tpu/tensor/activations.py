"""Quantized activations.

Functional analogue of the reference activation tensors
(`optimum/quanto/tensor/activations/{quantization.py,qbytes.py}`):
activations are always quantized **per-tensor** to an 8-bit qtype with a
scalar scale (reference `activations/quantization.py:24-39`).

Instead of an ATen dispatch table (`activations/qbytes_ops.py:31-284`), ops on
quantized activations are explicit functions in `quanto_tpu.ops`; anything
else dequantizes first (`qfallback`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.quantize import dequantize_symmetric, quantize_symmetric
from .qarray import QArray, register_qarray
from .qtype import qtype


__all__ = [
    "ActivationQBytesArray",
    "quantize_activation",
    "fake_quantize_activation",
    "attach_consumption_cell",
    "mark_dequantized",
    "mark_quantized_use",
]


def attach_consumption_cell(x: "ActivationQBytesArray", cell: dict) -> None:
    """Attach a mutable consumption-tracking cell (calibration streamline).

    The functional analogue of the reference's TorchFunctionMode consumption
    tracking (`calibrate.py:90-105`): during the eager calibration pass,
    consumers record whether a quantized output was used *as quantized data*
    or merely dequantized, and `Calibration.__exit__` disables output
    quantization for producers whose outputs are never consumed quantized.
    """
    object.__setattr__(x, "_track", cell)


def mark_dequantized(x) -> None:
    cell = getattr(x, "_track", None)
    if cell is not None:
        cell["dequantized"] = True


def mark_quantized_use(x) -> None:
    cell = getattr(x, "_track", None)
    if cell is not None:
        cell["quantized_use"] = True


@register_qarray
class ActivationQBytesArray(QArray):
    """8-bit per-tensor symmetric quantized activation: `_data * _scale`."""

    _data: jnp.ndarray
    _scale: jnp.ndarray
    qtype: qtype
    float_dtype: jnp.dtype

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._data.shape)

    @property
    def axis(self):
        return None

    @property
    def dtype(self):
        return self.float_dtype

    @property
    def data(self) -> jnp.ndarray:
        return self._data

    @property
    def scale(self) -> jnp.ndarray:
        return self._scale

    def dequantize(self) -> jnp.ndarray:
        mark_dequantized(self)
        return dequantize_symmetric(self._data, self._scale, self.float_dtype)


def quantize_activation(t: jnp.ndarray, qt: qtype, scale: jnp.ndarray) -> ActivationQBytesArray:
    """Quantize an activation to 8-bit per-tensor with the given scalar scale.

    Mirrors `quantize_activation` (reference `activations/quantization.py:24-39`).
    """
    if qt.bits != 8:
        raise ValueError("Activations can only be quantized to 8-bit qtypes")
    scale = jnp.asarray(scale)
    if scale.size != 1:
        raise ValueError("Activation quantization requires a scalar scale")
    data = quantize_symmetric(t, qt, None, scale.reshape(()))
    return ActivationQBytesArray(
        _data=data, _scale=scale.reshape(()), qtype=qt, float_dtype=jnp.dtype(t.dtype)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quantize_activation(t: jnp.ndarray, qt: qtype, scale: jnp.ndarray) -> jnp.ndarray:
    """Quantize-dequantize round trip with a straight-through estimator.

    QAT analogue of the reference quantizer's identity backward
    (`activations/qbytes.py:40-43`): gradients flow unchanged to `t`, the
    scale receives no gradient.
    """
    return quantize_activation(t, qt, scale).dequantize()


def _fake_qa_fwd(t, qt, scale):
    return fake_quantize_activation(t, qt, scale), jnp.asarray(scale)


def _fake_qa_bwd(qt, scale, g):
    return (g, jnp.zeros_like(scale))


fake_quantize_activation.defvjp(_fake_qa_fwd, _fake_qa_bwd)
