"""Quantized linear (the hot op).

Functional replacement for the reference's `__torch_function__` interception
of `F.linear` (`tensor/weights/qbytes.py:249-274`, `weights/qbits.py:262-287`)
plus `WeightQBytesLinearFunction`/`QuantizedLinearFunction`
(`tensor/function.py:21-63`, `weights/qbytes.py:68-82`): in JAX the dispatch
is an explicit function of the operand types.

Paths:
- float x, `WeightQBytesArray` w  → weight-only mm (XLA fuses dequant);
- `ActivationQBytesArray` x (int8), int8 w → native MXU int8xint8 matmul with
  int32 accumulation, scaled by `x.scale * w.scale`;
- float x, `WeightQBitsArray` w → fused group-wise dequant matmul (Pallas
  kernel when enabled, XLA dequant-mm otherwise);
- plain arrays → standard matmul.

Weights follow the torch linear convention: shape [out_features, in_features].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .qbytes_mm import qbytes_mm
from . import config


def _tensor_types():
    # Imported lazily: the tensor package itself imports quanto_tpu.ops.
    from ..tensor.activations import ActivationQBytesArray
    from ..tensor.weights import WeightQBitsArray, WeightQBitsTpuArray, WeightQBytesArray

    return ActivationQBytesArray, WeightQBytesArray, WeightQBitsArray, WeightQBitsTpuArray


__all__ = ["qlinear"]


def _qbits_mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Sub-byte weight matmul: x[..., in] @ dequant(w)[out, in].T."""
    from ..tensor.weights import WeightQBitsTpuArray

    if isinstance(w, WeightQBitsTpuArray) and config.use_pallas_qbits():
        xk = w.pad_activations(x)  # off-envelope dims: zero-pad K (exact)
        if config.mesh_active() and jax.device_count() > 1:
            # Sharded execution: the custom_partitioning wrapper runs the
            # kernel per device on its local shard (column-parallel N shards,
            # row-parallel block-local K shards + psum, or replicated).
            from .pallas.qbits_mm_sharded import qbits_mm_partitioned

            out = qbits_mm_partitioned(
                xk, w._packed, w._scale_t, w._shift_t,
                w.qtype.bits, w.kernel_group_size,
                k_shards=w.k_shards, interpret=config.pallas_interpret(),
            )
            return w.slice_out(out).astype(x.dtype)
        from .pallas.qbits_mm import qbits_matmul_kernel_call

        out = qbits_matmul_kernel_call(
            xk,
            w._packed,
            w._scale_t,
            w._shift_t,
            w.qtype.bits,
            w.kernel_group_size,
            k_shards=w.k_shards,
            interpret=config.pallas_interpret(),
        )
        if out is not None:
            return w.slice_out(out)
    wdq = w.dequantize().astype(x.dtype)
    return jnp.matmul(x, wdq.T)


def qlinear(
    x,
    w,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """y = x @ w.T + bias with quantized operands."""
    ActivationQBytesArray, WeightQBytesArray, WeightQBitsArray, WeightQBitsTpuArray = (
        _tensor_types()
    )
    if isinstance(w, WeightQBytesArray):
        if isinstance(x, ActivationQBytesArray):
            from ..tensor.activations import mark_quantized_use

            mark_quantized_use(x)
            # Combined scale: per-tensor activation scale times per-axis
            # weight scale (reference `weights/qbytes.py:68-75`).
            output = qbytes_mm(x.data, w.data, x.scale * w.scale)
        else:
            output = qbytes_mm(x, w.data, w.scale)
    elif isinstance(w, (WeightQBitsArray, WeightQBitsTpuArray)):
        if isinstance(x, ActivationQBytesArray):
            # W4A8: int8 activations x int4 codes fused on the integer MXU
            # (beyond the reference, which routes this combo through the
            # dequantizing qfallback). Same float output semantics.
            if (
                isinstance(w, WeightQBitsTpuArray)
                and x.qtype.name == "qint8"
                and config.use_pallas_qbits()
            ):
                from ..tensor.activations import mark_quantized_use

                xk = w.pad_activations(x.data)  # zero int8 pads: exact
                if config.mesh_active() and jax.device_count() > 1:
                    from .pallas.qbits_mm_sharded import qbits_mm_partitioned

                    out = qbits_mm_partitioned(
                        xk, w._packed, w._scale_t, w._shift_t,
                        w.qtype.bits, w.kernel_group_size,
                        k_shards=w.k_shards, interpret=config.pallas_interpret(),
                    )
                    out = w.slice_out(out)
                    out = (out * jnp.asarray(x.scale, jnp.float32)).astype(w.float_dtype)
                    mark_quantized_use(x)
                    if bias is not None:
                        out = out + bias
                    return out
                from .pallas.qbits_mm import qbits_int8_matmul_kernel_call

                out = qbits_int8_matmul_kernel_call(
                    xk, x.scale, w._packed, w._scale_t, w._shift_t,
                    w.qtype.bits, w.kernel_group_size, w.float_dtype,
                    k_shards=w.k_shards,
                    interpret=config.pallas_interpret(),
                )
                if out is not None:
                    out = w.slice_out(out)
                    mark_quantized_use(x)
                    if bias is not None:
                        out = out + bias
                    return out
            x = x.dequantize()
        output = _qbits_mm(x, w)
    else:
        if isinstance(x, ActivationQBytesArray):
            x = x.dequantize()
        output = jnp.matmul(x, w.T)
    if bias is not None:
        output = output + bias
    return output
