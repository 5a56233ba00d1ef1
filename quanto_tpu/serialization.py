"""State-dict serialization for quantized NNX models.

Produces flat `{name: array}` dicts whose keys follow the reference's
flattened-QTensor naming so that checkpoints are interoperable with
optimum-quanto safetensors files:

- 8-bit weights: `{module}.weight._data` (int8/fp8), `{module}.weight._scale`
  (reference `tensor/weights/qbytes.py:225-247`);
- sub-byte weights: `{module}.weight._data._data` (packed uint8),
  `{module}.weight._scale`, `{module}.weight._shift`
  (reference `tensor/weights/qbits.py:223-259`, `tensor/packed.py:125-140`);
- activation scales: `{module}.input_scale`, `{module}.output_scale`
  (registered buffers in the reference, `nn/qmodule.py:140-141`);
- everything else (bias, unquantized params) under its dotted path.

Loading reconstructs frozen QArrays from these flat tensors using the
module's quantization config, mirroring `QModuleMixin._load_from_state_dict`
(reference `nn/qmodule.py:161-207`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .nn.qmodule import QModuleMixin
from .tensor.grouped import grouped_shape
from .tensor.packed import PackedArray
from .tensor.qarray import QArray
from .tensor.weights import WeightQBitsArray, WeightQBitsTpuArray, WeightQBytesArray


__all__ = ["state_dict", "load_state_dict", "save_file", "load_file"]


def _path_name(path) -> str:
    return ".".join(str(p) for p in path)


def _flatten_weight(prefix: str, value, out: Dict[str, jnp.ndarray]) -> None:
    if isinstance(value, WeightQBitsTpuArray):
        # Optimized layouts always serialize in the kernel-agnostic form
        # (reference `weights/qbytes.py:211-216`).
        value = value.to_generic()
    if isinstance(value, WeightQBytesArray):
        out[f"{prefix}._data"] = value._data
        out[f"{prefix}._scale"] = value._scale
    elif isinstance(value, WeightQBitsArray):
        out[f"{prefix}._data._data"] = value._data.packed_data
        out[f"{prefix}._scale"] = value._scale
        out[f"{prefix}._shift"] = value._shift
    elif isinstance(value, QArray):
        raise NotImplementedError(f"Cannot serialize QArray type {type(value).__name__}")
    else:
        out[prefix] = value


def state_dict(model) -> Dict[str, jnp.ndarray]:
    """Flattened state of an NNX model (quanto-compatible keys)."""
    out: Dict[str, jnp.ndarray] = {}
    for path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Variable):
            value = node.get_value()
            if value is None:
                continue
            _flatten_weight(_path_name(path), value, out)
    return out


def _rebuild_qweight(module: QModuleMixin, prefix: str, sd, float_dtype) -> Optional[QArray]:
    """Reconstruct a frozen weight QArray for `module` from flat tensors."""
    qt = module.weight_qtype
    if qt is None:
        return None
    if qt.bits == 8:
        data_key = f"{prefix}._data"
        scale_key = f"{prefix}._scale"
        if data_key not in sd:
            return None
        data = jnp.asarray(sd[data_key])
        scale = jnp.asarray(sd[scale_key])
        axis = None if scale.size == 1 else 0
        if data.dtype != qt.dtype:
            data = data.view(qt.dtype) if data.dtype.itemsize == 1 else data.astype(qt.dtype)
        return WeightQBytesArray(
            _data=data,
            _scale=scale,
            qtype=qt,
            axis=axis,
            float_dtype=jnp.dtype(scale.dtype),
            activation_qtype=module.activation_qtype,
        )
    packed_key = f"{prefix}._data._data"
    if packed_key not in sd:
        return None
    wshape = tuple(module.weight_shape)
    from .ops import config as _cfg

    if _cfg.use_pallas_qbits():
        # Native one-pass host repack straight into the kernel layout
        # (skips the device-side unpack/ungroup/repack round trip).
        tpu_qw = WeightQBitsTpuArray.from_serialized_host(
            sd[packed_key], sd[f"{prefix}._scale"], sd[f"{prefix}._shift"],
            qt, module.weight_group_size, wshape,
            jnp.asarray(sd[f"{prefix}._scale"]).dtype,
        )
        if tpu_qw is not None:
            return tpu_qw
    packed = jnp.asarray(sd[packed_key]).astype(jnp.uint8)
    scale = jnp.asarray(sd[f"{prefix}._scale"])
    shift = jnp.asarray(sd[f"{prefix}._shift"])
    gshape = (
        grouped_shape(wshape, 0, module.weight_group_size)
        if module.weight_group_size is not None
        else wshape
    )
    packed_arr = PackedArray(_data=packed, bits=qt.bits, orig_shape=tuple(gshape))
    qw = WeightQBitsArray(
        _data=packed_arr,
        _scale=scale,
        _shift=shift,
        qtype=qt,
        axis=0,
        group_size=module.weight_group_size,
        orig_shape=wshape,
        float_dtype=jnp.dtype(scale.dtype),
    )
    from .ops import config as ops_config

    if ops_config.use_pallas_qbits():
        # Repack into the kernel layout (reference `optimize()` after
        # deserialization, `weights/qbits.py:201-221`).
        qw = qw.optimize()
    return qw


def load_state_dict(model, sd, strict: bool = True) -> Dict[str, list]:
    """Load a flat state dict into an NNX model, rebuilding frozen QArrays.

    Returns {"missing": [...], "unexpected": [...]} like torch.
    """
    used = set()
    missing = []
    # Map of qmodule paths for weight reconstruction.
    qmodule_paths = {}
    for path, node in nnx.iter_graph(model):
        if isinstance(node, QModuleMixin):
            qmodule_paths[path] = node
    for path, node in nnx.iter_graph(model):
        if not isinstance(node, nnx.Variable):
            continue
        name = _path_name(path)
        owner = qmodule_paths.get(path[:-1])
        attr = path[-1]
        if owner is not None and attr == "weight" and owner.weight_qtype is not None:
            qw = _rebuild_qweight(owner, name, sd, None)
            if qw is not None:
                node.set_value(qw)
                for suffix in ("._data", "._scale", "._shift", "._data._data"):
                    if f"{name}{suffix}" in sd:
                        used.add(f"{name}{suffix}")
                continue
            # Fall through: maybe a float weight was serialized (unfrozen).
        if name in sd:
            node.set_value(jnp.asarray(sd[name]))
            used.add(name)
        else:
            if node.get_value() is not None:
                missing.append(name)
    unexpected = [k for k in (sd.keys() if hasattr(sd, "keys") else []) if k not in used]
    if strict and (missing or unexpected):
        raise KeyError(f"state dict mismatch: missing={missing[:5]} unexpected={unexpected[:5]}")
    return {"missing": missing, "unexpected": unexpected}


def save_file(model, path: str, metadata: Optional[Dict[str, str]] = None) -> None:
    from .utils.safetensors_io import save_file as st_save

    st_save(state_dict(model), path, metadata=metadata)


def load_file(model, path: str, strict: bool = True):
    from .utils.safetensors_io import load_file as st_load

    return load_state_dict(model, st_load(path), strict=strict)
