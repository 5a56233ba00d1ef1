"""Quantized module layer (flax NNX).

TPU-native analogue of the reference module layer
(`optimum/quanto/nn/qmodule.py:44-312`). The reference mutates torch modules
in place and relies on forward hooks; here quantized modules are `flax.nnx`
modules whose quantization metadata is static graph state and whose scales are
NNX variables, so the whole model stays a jittable pytree.

Workflow states (mirroring the reference float → dynamic → calibrated →
frozen pipeline):
- **dynamic**: `weight` holds float values; `qweight` re-quantizes on every
  access (reference `nn/qmodule.py:245-279`).
- **calibrated**: `input_scale` / `output_scale` variables updated by
  `Calibration` (see `quanto_tpu.calibrate`).
- **frozen**: `weight` holds a `QArray`; dynamic quantization disappears
  (reference `nn/qmodule.py:304-308`).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import nnx

from ..tensor.activations import fake_quantize_activation, quantize_activation
from ..tensor.optimizers import AbsmaxOptimizer, MaxOptimizer, Optimizer
from ..tensor.qarray import QArray
from ..tensor.qtype import qtype, qtypes
from ..tensor.weights import fake_quantize_weight, quantize_weight


__all__ = [
    "QScale",
    "QModuleMixin",
    "register_qmodule",
    "quantize_module",
    "quantized_module_classes",
]


class QScale(nnx.Variable):
    """Activation-scale buffer (not a trainable parameter)."""


# Registry: nnx module class -> quantized module class
# (reference `nn/qmodule.py:44-78`).
_QMODULE_TABLE: dict = {}


def register_qmodule(module_cls):
    """Register a QModule class as the quantized form of `module_cls`."""

    def wrapper(cls):
        _QMODULE_TABLE[module_cls] = cls
        return cls

    return wrapper


def quantized_module_classes():
    return dict(_QMODULE_TABLE)


def quantize_module(module, **kwargs):
    """Return the quantized counterpart of an nnx module, or None.

    Mirrors `quantize_module` (reference `nn/qmodule.py:81-91`).
    """
    for cls in _QMODULE_TABLE:
        if isinstance(module, cls):
            return _QMODULE_TABLE[cls].from_module(module, **kwargs)
    return None


def _resolve_qtype(qt: Optional[Union[str, qtype]]) -> Optional[qtype]:
    if isinstance(qt, str):
        if qt not in qtypes:
            raise ValueError(f"Unknown qtype {qt!r}; valid names: {sorted(qtypes)}")
        return qtypes[qt]
    return qt


def _auto_group_size(in_features: int) -> Optional[int]:
    """Largest group size in {128, 96, 64, 32} dividing in_features, applied
    only when in_features exceeds 128.

    Mirrors the reference auto-selection (`nn/qmodule.py:120-129`).
    """
    group_size = 128
    if in_features > group_size:
        while in_features % group_size != 0 and group_size > 32:
            group_size -= 32
        if in_features % group_size == 0:
            return group_size
    return None


class QModuleMixin:
    """Shared quantization behavior for NNX quantized modules.

    Concrete subclasses (QLinear, QConv2d, QLayerNorm) call
    `_init_quantization` from their constructor and use `qweight`,
    `maybe_quantize_input` / `maybe_quantize_output` in `__call__`.
    """

    def _init_quantization(
        self,
        weights: Optional[Union[str, qtype]],
        activations: Optional[Union[str, qtype]],
        optimizer: Optional[Optimizer],
        in_features: Optional[int],
    ) -> None:
        weights = _resolve_qtype(weights)
        activations = _resolve_qtype(activations)
        group_size = None
        if weights is not None and weights.bits < 8 and in_features is not None:
            group_size = _auto_group_size(in_features)
        self.weight_qtype = weights
        self.weight_group_size = group_size
        self.activation_qtype = activations
        if optimizer is None and weights is not None:
            # Default optimizers mirror the reference (`nn/qmodule.py:136-138`).
            optimizer = AbsmaxOptimizer() if weights.bits == 8 else MaxOptimizer()
        self.optimizer = optimizer
        # Scales default to 1 until calibrated (reference `nn/qmodule.py:140-141`).
        self.input_scale = QScale(jnp.ones((), dtype=jnp.float32))
        self.output_scale = QScale(jnp.ones((), dtype=jnp.float32))
        # Output quantization is enabled with activations, and may be disabled
        # by Calibration's streamline pass (reference `calibrate.py:158-164`).
        self.quantize_outputs = activations is not None
        # Calibration mode flag, toggled by the Calibration context manager.
        self.calibrating = False
        self._calibration = None
        # QAT mode: use differentiable fake-quantization (float compute with
        # straight-through gradients) instead of integer kernels.
        self.qat = False

    # --- weight quantization -------------------------------------------------

    @property
    def frozen(self) -> bool:
        """True once the weight holds a QArray (reference `nn/qmodule.py:310-312`)."""
        w = getattr(self, "weight", None)
        return w is not None and isinstance(w.get_value(), QArray)

    @property
    def qweight(self):
        """Quantized weight: dynamic re-quantization until frozen.

        Mirrors the reference `qweight` property (`nn/qmodule.py:245-279`).
        """
        if self.weight_qtype is None:
            return None
        w = self.weight.get_value()
        if isinstance(w, QArray):
            return w
        if self.weight_qtype.bits == 8:
            scale = self.optimizer(w, self.weight_qtype, axis=0)
            return quantize_weight(
                w,
                self.weight_qtype,
                0,
                scale,
                activation_qtype=self.activation_qtype,
            )
        scale, shift = self.optimizer(
            w, self.weight_qtype, axis=0, group_size=self.weight_group_size
        )
        return quantize_weight(
            w,
            self.weight_qtype,
            0,
            scale,
            shift=shift,
            group_size=self.weight_group_size,
        )

    def fake_qweight(self) -> jnp.ndarray:
        """Differentiable quantize-dequantize of the float weight (QAT path)."""
        w = self.weight.get_value()
        if isinstance(w, QArray):
            return w.dequantize()
        if self.weight_qtype is None:
            return w
        if self.weight_qtype.bits == 8:
            scale = self.optimizer(w, self.weight_qtype, axis=0)
            return fake_quantize_weight(w, self.weight_qtype, 0, scale, None, None)
        scale, shift = self.optimizer(
            w, self.weight_qtype, axis=0, group_size=self.weight_group_size
        )
        return fake_quantize_weight(
            w, self.weight_qtype, 0, scale, shift, self.weight_group_size
        )

    def freeze(self) -> None:
        """Replace the float weight with its quantized form, repacked into an
        optimized kernel layout when available (reference `nn/qmodule.py:304-308`
        plus the `create()` kernel selection, `weights/qbits.py:94-138`)."""
        if self.weight_qtype is None or self.frozen:
            return
        qw = self.qweight
        if hasattr(qw, "optimize"):
            from ..ops import config as ops_config

            if ops_config.use_pallas_qbits():
                qw = qw.optimize()
        self.weight.set_value(qw)

    # --- activation quantization ---------------------------------------------

    def maybe_quantize_input(self, x):
        """Quantize the input activation (reference `nn/qmodule.py:284-294`)."""
        if self.activation_qtype is None:
            return x
        if isinstance(x, QArray):
            # Consuming an already-quantized input keeps the producer's
            # output quantization alive through streamline.
            from ..tensor.activations import mark_quantized_use

            mark_quantized_use(x)
            if self.calibrating and self._calibration is not None:
                self._calibration.calibrate_input(self, x)
            return x
        if self.calibrating and self._calibration is not None:
            self._calibration.calibrate_input(self, x)
        if self.qat:
            return fake_quantize_activation(
                x, self.activation_qtype, self.input_scale.get_value()
            )
        return quantize_activation(x, self.activation_qtype, self.input_scale.get_value())

    def maybe_quantize_output(self, out):
        """Quantize the output activation (reference `nn/qmodule.py:296-302`)."""
        if self.activation_qtype is None:
            return out
        if self.calibrating and self._calibration is not None:
            self._calibration.calibrate_output(self, out)
            # During calibration, outputs ARE quantized (with the live scale)
            # and tagged so streamline can observe how they are consumed
            # (reference `calibrate.py:176-189` tag_outputs).
            qout = quantize_activation(
                out, self.activation_qtype, self.output_scale.get_value()
            )
            self._calibration.tag_output(self, qout)
            return qout
        if not self.quantize_outputs:
            return out
        if self.qat:
            return fake_quantize_activation(
                out, self.activation_qtype, self.output_scale.get_value()
            )
        return quantize_activation(out, self.activation_qtype, self.output_scale.get_value())
