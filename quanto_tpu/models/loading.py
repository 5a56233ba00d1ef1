"""Hugging Face checkpoint interop for NNX models.

Translates between torch-style HF state dicts (as stored in safetensors
shards) and our NNX modules:

- `torch.nn.Linear.weight` is `[out, in]`; `nnx.Linear.kernel` is `[in, out]`
  → transpose on the way in/out. Quantized `QLinear`s already store `[out, in]`
  so their flattened tensors (`weight._data`, `weight._scale`, ...) pass
  through unchanged — this is what makes checkpoints produced by the torch
  reference loadable directly (`optimum/quanto/nn/qmodule.py:147-207`).
- `torch.nn.Embedding.weight` ↔ `nnx.Embed.embedding` (no transpose).
- norm weights/biases keep their names.

`hf_state_dict` is the inverse: it always emits torch-convention names so a
checkpoint saved here can be consumed by the torch reference.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
from flax import nnx

from ..nn.qmodule import QModuleMixin
from ..serialization import _flatten_weight, _rebuild_qweight
from .llama import RMSNorm


__all__ = ["load_hf_state_dict", "hf_state_dict"]


def _path_name(path) -> str:
    return ".".join(str(p) for p in path)


def load_hf_state_dict(model, tensors: Mapping[str, jnp.ndarray], dtype=None) -> Dict[str, list]:
    """Load a torch-convention state dict (float or quanto-quantized) into an
    NNX model whose attribute paths mirror the HF module names."""
    missing, loaded = [], set()

    def get(name):
        if name in tensors:
            loaded.add(name)
            t = jnp.asarray(tensors[name])
            return t
        return None

    def cast(t, like):
        if dtype is not None and jnp.issubdtype(t.dtype, jnp.floating):
            return t.astype(dtype)
        return t

    for path, node in nnx.iter_graph(model):
        if not isinstance(node, nnx.Module):
            continue
        name = _path_name(path)
        prefix = name + "." if name else ""
        if isinstance(node, QModuleMixin):
            if getattr(node, "weight", None) is None:
                # QLayerNorm: float scale/bias under torch LayerNorm names.
                w = get(f"{prefix}weight")
                if w is not None and getattr(node, "scale", None) is not None:
                    node.scale.set_value(cast(w, node.scale))
                b = get(f"{prefix}bias")
                if b is not None and getattr(node, "bias", None) is not None:
                    node.bias.set_value(cast(b, node.bias))
                for skey in ("input_scale", "output_scale"):
                    s = get(f"{prefix}{skey}")
                    if s is not None:
                        getattr(node, skey).set_value(jnp.asarray(s, jnp.float32).reshape(()))
                continue
            wkey = f"{prefix}weight"
            qw = _rebuild_qweight(node, wkey, tensors, None)
            if qw is not None:
                node.weight.set_value(qw)
                for suffix in ("._data", "._scale", "._shift", "._data._data"):
                    if f"{wkey}{suffix}" in tensors:
                        loaded.add(f"{wkey}{suffix}")
            else:
                w = get(wkey)
                if w is not None:
                    node.weight.set_value(cast(w, node.weight))
                else:
                    missing.append(wkey)
            b = get(f"{prefix}bias")
            if b is not None and getattr(node, "bias", None) is not None:
                node.bias.set_value(cast(b, node.bias))
            for skey in ("input_scale", "output_scale"):
                s = get(f"{prefix}{skey}")
                if s is not None:
                    getattr(node, skey).set_value(jnp.asarray(s, jnp.float32).reshape(()))
        elif isinstance(node, nnx.Linear):
            w = get(f"{prefix}weight")
            if w is not None:
                # HF Conv1D modules (GPT-2) already store [in, out].
                if not getattr(node, "_hf_conv1d", False):
                    w = jnp.transpose(w)
                node.kernel.set_value(cast(w, node.kernel))
            else:
                missing.append(f"{prefix}weight")
            if node.bias is not None:
                b = get(f"{prefix}bias")
                if b is not None:
                    node.bias.set_value(cast(b, node.bias))
        elif isinstance(node, nnx.Embed):
            w = get(f"{prefix}weight")
            if w is not None:
                node.embedding.set_value(cast(w, node.embedding))
            else:
                missing.append(f"{prefix}weight")
        elif isinstance(node, (RMSNorm,)):
            w = get(f"{prefix}weight")
            if w is not None:
                node.weight.set_value(cast(w, node.weight))
            else:
                missing.append(f"{prefix}weight")
        elif isinstance(node, (nnx.LayerNorm, nnx.GroupNorm)):
            w = get(f"{prefix}weight")
            if w is not None and node.use_scale:
                node.scale.set_value(cast(w, node.scale))
            b = get(f"{prefix}bias")
            if b is not None and node.use_bias:
                node.bias.set_value(cast(b, node.bias))
        elif isinstance(node, nnx.Conv):
            w = get(f"{prefix}weight")
            if w is not None:
                # torch conv OIHW -> flax HWIO.
                node.kernel.set_value(cast(jnp.transpose(w, (2, 3, 1, 0)), node.kernel))
            if node.use_bias:
                b = get(f"{prefix}bias")
                if b is not None:
                    node.bias.set_value(cast(b, node.bias))
    # Bare parameters not owned by a recognized module class (e.g. PixArt
    # scale_shift_table): match by exact dotted path.
    for path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Param):
            name = _path_name(path)
            if name not in loaded and name in tensors:
                node.set_value(cast(jnp.asarray(tensors[name]), node))
                loaded.add(name)
    unexpected = [k for k in tensors.keys() if k not in loaded]
    return {"missing": missing, "unexpected": unexpected}


def hf_state_dict(model) -> Dict[str, jnp.ndarray]:
    """Flatten an NNX model into a torch-convention state dict (quanto keys
    for quantized weights, `weight`/`bias` names for float modules)."""
    out: Dict[str, jnp.ndarray] = {}
    handled = set()
    for path, node in nnx.iter_graph(model):
        if not isinstance(node, nnx.Module):
            continue
        name = _path_name(path)
        prefix = name + "." if name else ""
        if isinstance(node, QModuleMixin):
            if getattr(node, "weight", None) is not None:
                _flatten_weight(f"{prefix}weight", node.weight.get_value(), out)
            elif getattr(node, "scale", None) is not None:
                # QLayerNorm: emit torch LayerNorm names.
                out[f"{prefix}weight"] = node.scale.get_value()
            if getattr(node, "bias", None) is not None:
                out[f"{prefix}bias"] = node.bias.get_value()
            out[f"{prefix}input_scale"] = node.input_scale.get_value()
            out[f"{prefix}output_scale"] = node.output_scale.get_value()
        elif isinstance(node, nnx.Linear):
            kernel = node.kernel.get_value()
            if not getattr(node, "_hf_conv1d", False):
                kernel = jnp.transpose(kernel)
            out[f"{prefix}weight"] = kernel
            if node.bias is not None:
                out[f"{prefix}bias"] = node.bias.get_value()
        elif isinstance(node, nnx.Embed):
            out[f"{prefix}weight"] = node.embedding.get_value()
        elif isinstance(node, RMSNorm):
            out[f"{prefix}weight"] = node.weight.get_value()
        elif isinstance(node, (nnx.LayerNorm, nnx.GroupNorm)):
            if node.use_scale:
                out[f"{prefix}weight"] = node.scale.get_value()
            if node.use_bias:
                out[f"{prefix}bias"] = node.bias.get_value()
        elif isinstance(node, nnx.Conv):
            out[f"{prefix}weight"] = jnp.transpose(node.kernel.get_value(), (3, 2, 0, 1))
            if node.use_bias:
                out[f"{prefix}bias"] = node.bias.get_value()
        else:
            continue
        handled.add(path)
    # Bare parameters owned by unhandled container modules (e.g. PixArt
    # scale_shift_table).
    for path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Param) and path[:-1] not in handled:
            name = _path_name(path)
            if name not in out:
                out[name] = node.get_value()
    return out
