"""Quantized layer norm module.

NNX analogue of the reference `QLayerNorm`
(`optimum/quanto/nn/qlayernorm.py:26-53`): weights are NEVER quantized — the
module only exists to quantize its *outputs*, and is only created when an
activation qtype is requested.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..tensor.optimizers import Optimizer
from ..tensor.qarray import QArray
from ..tensor.qtype import qtype
from .qmodule import QModuleMixin, register_qmodule


__all__ = ["QLayerNorm"]


@register_qmodule(nnx.LayerNorm)
class QLayerNorm(QModuleMixin, nnx.Module):
    def __init__(
        self,
        num_features: int,
        epsilon: float = 1e-6,
        use_scale: bool = True,
        use_bias: bool = True,
        *,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
        param_dtype=jnp.float32,
    ):
        self.num_features = num_features
        self.epsilon = epsilon
        self.scale = nnx.Param(jnp.ones((num_features,), param_dtype)) if use_scale else None
        self.bias = nnx.Param(jnp.zeros((num_features,), param_dtype)) if use_bias else None
        # Weights are never quantized: pass weights=None to the mixin.
        self._init_quantization(None, activations, optimizer, in_features=None)
        self.quantize_inputs = False
        # `weight` is absent; `frozen` must not look for it.
        self.weight = None

    @property
    def frozen(self) -> bool:
        return False

    def freeze(self) -> None:
        pass

    @classmethod
    def from_module(
        cls,
        module: nnx.LayerNorm,
        weights=None,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
    ) -> Optional["QLayerNorm"]:
        if activations is None:
            # Mirrors the reference qcreate returning None (`qlayernorm.py:37-46`).
            return None
        scale = module.scale.get_value() if module.use_scale else None
        num_features = module.num_features
        qmodule = cls(
            num_features,
            epsilon=module.epsilon,
            use_scale=module.use_scale,
            use_bias=module.use_bias,
            activations=activations,
            optimizer=optimizer,
            param_dtype=scale.dtype if scale is not None else jnp.float32,
        )
        if module.use_scale:
            qmodule.scale.set_value(scale)
        if module.use_bias:
            qmodule.bias.set_value(module.bias.get_value())
        return qmodule

    def __call__(self, x):
        if isinstance(x, QArray):
            x = x.dequantize()
        if self.calibrating and self._calibration is not None:
            self._calibration.calibrate_input(self, x)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out.astype(x.dtype)
        if self.scale is not None:
            out = out * self.scale.get_value()
        if self.bias is not None:
            out = out + self.bias.get_value()
        return self.maybe_quantize_output(out)
