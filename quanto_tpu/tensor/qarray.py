"""QArray: quantized array pytrees.

The reference implements quantized tensors as `torch.Tensor` subclasses with
`__torch_function__`/`__torch_dispatch__` interception
(`optimum/quanto/tensor/qtensor.py:21-85`). JAX is functional, so the
TPU-native design is different: a QArray is a **pytree node** — a frozen
dataclass whose array children (`_data`, `_scale`, `_shift`) are traced,
sharded and differentiated like any other leaves, and whose quantization
metadata (qtype, axis, group size, logical shape) rides along as static
aux data. Quantized ops are explicit functions (see `quanto_tpu.ops`); the
analogue of the reference's universal `qfallback` is simply calling
`.dequantize()` before an unsupported op.

Because QArrays are pytrees they compose for free with `jit`, `grad`,
`vmap`, `jax.sharding.NamedSharding` and checkpoint flattening.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


__all__ = ["QArray", "register_qarray", "qfallback"]


def register_qarray(cls):
    """Class decorator: freeze the dataclass and register it as a JAX pytree.

    Fields named with a leading underscore are array children; all other
    fields are static metadata (must be hashable).
    """
    cls = dataclasses.dataclass(frozen=True, eq=False)(cls)
    data_fields = [f.name for f in dataclasses.fields(cls) if f.name.startswith("_")]
    meta_fields = [f.name for f in dataclasses.fields(cls) if not f.name.startswith("_")]
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


class QArray:
    """Abstract base for quantized array pytrees.

    Concrete subclasses store integer/fp8 payloads plus scales and expose
    `dequantize()` back to the activation dtype. Mirrors the role of the
    reference `QTensor` base (`tensor/qtensor.py:31-85`).
    """

    # Subclasses define: qtype, axis and array children.

    @property
    def shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def dtype(self):
        """The floating dtype `dequantize()` returns (the 'public' dtype)."""
        raise NotImplementedError

    def dequantize(self) -> jnp.ndarray:
        raise NotImplementedError

    def numpy(self):
        import numpy as np

        return np.asarray(self.dequantize())


def qfallback(fn, *args, **kwargs):
    """Dequantize any QArray arguments and call `fn` on plain arrays.

    Functional analogue of the reference fallback (`tensor/qtensor.py:21-29`).
    """
    args, kwargs = jax.tree_util.tree_map(
        lambda x: x.dequantize() if isinstance(x, QArray) else x,
        (args, kwargs),
        is_leaf=lambda x: isinstance(x, QArray),
    )
    return fn(*args, **kwargs)
