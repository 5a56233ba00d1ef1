"""Quantized linear module.

NNX analogue of the reference `QLinear` (`optimum/quanto/nn/qlinear.py:26-50`):
weights are always quantized, bias never, inputs quantized when an activation
qtype is set. The weight is stored in the torch linear convention
`[out_features, in_features]` so per-output-channel (axis 0) scales and the
serialized layout match quanto checkpoints bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
from flax import nnx

from ..ops.qlinear import qlinear
from ..tensor.optimizers import Optimizer
from ..tensor.qtype import qtype
from .qmodule import QModuleMixin, register_qmodule


__all__ = ["QLinear"]


@register_qmodule(nnx.Linear)
class QLinear(QModuleMixin, nnx.Module):
    def __init__(
        self,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        *,
        weights: Optional[Union[str, qtype]] = None,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        self.in_features = in_features
        self.out_features = out_features
        if rngs is not None:
            initializer = nnx.initializers.lecun_normal()
            w = initializer(rngs.params(), (out_features, in_features), param_dtype)
        else:
            w = jnp.zeros((out_features, in_features), dtype=param_dtype)
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_features,), dtype=param_dtype)) if use_bias else None
        self._init_quantization(weights, activations, optimizer, in_features)

    @property
    def weight_shape(self):
        return (self.out_features, self.in_features)

    @classmethod
    def from_module(
        cls,
        module: nnx.Linear,
        weights: Optional[Union[str, qtype]] = None,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
    ) -> Optional["QLinear"]:
        """Build from an `nnx.Linear`, transposing the flax `[in, out]` kernel
        to the torch `[out, in]` convention (reference `from_module`,
        `nn/qmodule.py:209-232`)."""
        if weights is None:
            # The reference never creates weight-float QLinears.
            return None
        kernel = module.kernel.get_value()
        in_features, out_features = kernel.shape
        qmodule = cls(
            in_features,
            out_features,
            use_bias=module.bias is not None,
            weights=weights,
            activations=activations,
            optimizer=optimizer,
            param_dtype=kernel.dtype,
        )
        qmodule.weight.set_value(jnp.transpose(kernel))
        if module.bias is not None:
            qmodule.bias.set_value(module.bias.get_value())
        return qmodule

    def __call__(self, x):
        x = self.maybe_quantize_input(x)
        if self.qat and not self.frozen:
            out = jnp.matmul(x, self.fake_qweight().T.astype(x.dtype))
            if self.bias is not None:
                out = out + self.bias.get_value()
        else:
            w = self.qweight if self.weight_qtype is not None else self.weight.get_value()
            bias = None if self.bias is None else self.bias.get_value()
            out = qlinear(x, w, bias)
        return self.maybe_quantize_output(out)
