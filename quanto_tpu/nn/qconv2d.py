"""Quantized 2D convolution module.

NNX analogue of the reference `QConv2d` (`optimum/quanto/nn/qconv2d.py:26-55`):
weights always quantized per-output-channel, bias never, inputs NOT quantized
by default. The weight is stored in the torch `OIHW` convention so axis-0
scales and serialization match quanto; activations use the flax `NHWC` layout
(TPU-native: channels-last keeps the lane dimension contiguous for the MXU).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import nnx
from jax import lax

from ..tensor.optimizers import Optimizer
from ..tensor.qarray import QArray
from ..tensor.qtype import qtype
from .qmodule import QModuleMixin, register_qmodule


__all__ = ["QConv2d"]


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


@register_qmodule(nnx.Conv)
class QConv2d(QModuleMixin, nnx.Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Sequence[int]],
        strides: Union[int, Sequence[int]] = 1,
        padding: Union[str, int, Sequence[Tuple[int, int]]] = 0,
        dilation: Union[int, Sequence[int]] = 1,
        feature_group_count: int = 1,
        use_bias: bool = True,
        *,
        weights: Optional[Union[str, qtype]] = None,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.strides = _pair(strides)
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        self.padding = padding
        self.dilation = _pair(dilation)
        self.feature_group_count = feature_group_count
        kh, kw = self.kernel_size
        wshape = (out_channels, in_channels // feature_group_count, kh, kw)
        if rngs is not None:
            initializer = nnx.initializers.lecun_normal()
            w = initializer(rngs.params(), wshape, param_dtype)
        else:
            w = jnp.zeros(wshape, dtype=param_dtype)
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_channels,), dtype=param_dtype)) if use_bias else None
        # Convolutions do not quantize inputs by default (reference
        # `nn/qconv2d.py:36-40` passes activations=None to the mixin input hook
        # via quantize_input=False).
        self._init_quantization(weights, activations, optimizer, in_features=None)
        self.quantize_inputs = False

    @property
    def weight_shape(self):
        kh, kw = self.kernel_size
        return (self.out_channels, self.in_channels // self.feature_group_count, kh, kw)

    @classmethod
    def from_module(
        cls,
        module: nnx.Conv,
        weights: Optional[Union[str, qtype]] = None,
        activations: Optional[Union[str, qtype]] = None,
        optimizer: Optional[Optimizer] = None,
    ) -> Optional["QConv2d"]:
        if weights is None:
            return None
        kernel = module.kernel.get_value()
        if kernel.ndim != 4:
            return None  # only 2D convolutions are supported
        # flax kernel layout: (kh, kw, in/groups, out) -> torch OIHW.
        kh, kw, in_g, out_channels = kernel.shape
        groups = module.feature_group_count
        qmodule = cls(
            in_g * groups,
            out_channels,
            (kh, kw),
            strides=module.strides,
            padding=module.padding,
            dilation=module.kernel_dilation,
            feature_group_count=groups,
            use_bias=module.use_bias,
            weights=weights,
            activations=activations,
            optimizer=optimizer,
            param_dtype=kernel.dtype,
        )
        qmodule.weight.set_value(jnp.transpose(kernel, (3, 2, 0, 1)))
        if module.use_bias:
            qmodule.bias.set_value(module.bias.get_value())
        return qmodule

    def maybe_quantize_input(self, x):
        if not self.quantize_inputs:
            if self.calibrating and self._calibration is not None:
                self._calibration.calibrate_input(self, x)
            return x
        return super().maybe_quantize_input(x)

    def __call__(self, x):
        """NHWC convolution; quantized weights are dequantized and XLA fuses
        the scale multiply into the convolution's weight read."""
        x = self.maybe_quantize_input(x)
        if isinstance(x, QArray):
            x = x.dequantize()
        if self.qat and not self.frozen:
            w = self.fake_qweight()
        elif self.weight_qtype is not None:
            w = self.qweight.dequantize()
        else:
            w = self.weight.get_value()
        # OIHW -> HWIO for the NHWC conv.
        w = jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype)
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=self.strides,
            padding=self.padding if not isinstance(self.padding, int) else [(self.padding,) * 2] * 2,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.bias is not None:
            out = out + self.bias.get_value()
        return self.maybe_quantize_output(out)
