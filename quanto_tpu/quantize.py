"""Model-level quantization workflow.

NNX analogue of the reference workflow layer
(`optimum/quanto/quantize.py:27-170`): walk the module tree, swap quantizable
modules for their quantized counterparts (with fnmatch include/exclude
filters), freeze, produce the serializable quantization map, and requantize a
fresh skeleton from a (state_dict, qmap) pair.
"""

from __future__ import annotations

import fnmatch
from typing import List, Optional, Union

from flax import nnx

from .nn.qmodule import QModuleMixin, quantize_module
from .tensor.optimizers import Optimizer
from .tensor.qtype import qtype


__all__ = [
    "quantize",
    "freeze",
    "quantization_map",
    "requantize",
    "named_qmodules",
    "get_module_by_name",
    "set_module_by_name",
]


def _path_name(path) -> str:
    return ".".join(str(p) for p in path)


def _iter_modules(model):
    """(name, path, module) for every nnx.Module in the tree, root excluded."""
    for path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Module) and len(path) > 0:
            yield _path_name(path), path, node


def get_module_by_name(model, name: Union[str, tuple]):
    path = name.split(".") if isinstance(name, str) else list(name)
    obj = model
    for p in path:
        if isinstance(p, str) and p.isdigit():
            p = int(p)
        obj = obj[p] if isinstance(p, int) else getattr(obj, p)
    return obj


def set_module_by_name(model, name: Union[str, tuple], new_module) -> None:
    """Replace a submodule in place (reference `quantize.py:27-34`)."""
    path = name.split(".") if isinstance(name, str) else list(name)
    parent = get_module_by_name(model, path[:-1]) if len(path) > 1 else model
    last = path[-1]
    if isinstance(last, str) and last.isdigit():
        last = int(last)
    if isinstance(last, int):
        parent[last] = new_module
    else:
        setattr(parent, last, new_module)


def named_qmodules(model):
    """(name, qmodule) pairs for every quantized module in the tree
    (the root itself included, under the empty name)."""
    if isinstance(model, QModuleMixin):
        yield "", model
    for name, _path, m in _iter_modules(model):
        if isinstance(m, QModuleMixin):
            yield name, m


def quantize(
    model,
    weights: Optional[Union[str, qtype]] = None,
    activations: Optional[Union[str, qtype]] = None,
    optimizer: Optional[Optimizer] = None,
    include: Optional[Union[str, List[str]]] = None,
    exclude: Optional[Union[str, List[str]]] = None,
) -> None:
    """Swap quantizable submodules of an NNX model for quantized versions.

    In-place on the module tree, mirroring the reference `quantize()`
    (`quantize.py:55-98`) including the fnmatch include/exclude semantics.
    """
    if include is not None and isinstance(include, str):
        include = [include]
    if exclude is not None and isinstance(exclude, str):
        exclude = [exclude]
    # Materialize the walk first: we mutate the tree while iterating.
    candidates = [
        (name, path, m)
        for name, path, m in _iter_modules(model)
        if not isinstance(m, QModuleMixin)
    ]
    seen = set()
    for name, path, m in candidates:
        # A parent swap may have already replaced this subtree.
        if any(name.startswith(s + ".") or name == s for s in seen):
            continue
        if include is not None and not any(fnmatch.fnmatch(name, pat) for pat in include):
            continue
        if exclude is not None and any(fnmatch.fnmatch(name, pat) for pat in exclude):
            continue
        qmodule = quantize_module(
            m, weights=weights, activations=activations, optimizer=optimizer
        )
        if qmodule is not None:
            set_module_by_name(model, path, qmodule)
            seen.add(name)


def freeze(model) -> None:
    """Freeze every quantized module (reference `quantize.py:143-146`)."""
    for _name, m in named_qmodules(model):
        m.freeze()


def quantization_map(model) -> dict:
    """Serializable {module name: {"weights": ..., "activations": ...}} map
    (reference `quantize.py:149-170`)."""
    config = {}
    for name, m in named_qmodules(model):
        config[name] = {
            "weights": "none" if m.weight_qtype is None else m.weight_qtype.name,
            "activations": "none" if m.activation_qtype is None else m.activation_qtype.name,
        }
    return config


def requantize(model, state_dict, quantization_map: dict, device=None) -> None:
    """Re-apply a quantization map to a float skeleton model and load weights.

    `model` must be a float NNX model with the same structure the map was
    produced from. Mirrors the reference `requantize` (`quantize.py:101-140`):
    per-module quantize from the map, then state-dict restore (which rebuilds
    frozen QArrays directly). `device` optionally places every loaded array
    (reference `quantize.py:107-110` device argument).
    """
    import jax

    from .serialization import load_state_dict

    if device is not None:
        state_dict = {
            k: jax.device_put(v, device) for k, v in
            (state_dict.items() if hasattr(state_dict, "items") else ((k, state_dict[k]) for k in state_dict.keys()))
        }
    for name, cfg in quantization_map.items():
        weights = None if cfg["weights"] == "none" else cfg["weights"]
        activations = None if cfg["activations"] == "none" else cfg["activations"]
        try:
            m = get_module_by_name(model, name)
        except (AttributeError, KeyError, IndexError):
            continue
        qmodule = quantize_module(m, weights=weights, activations=activations, optimizer=None)
        if qmodule is not None:
            set_module_by_name(model, name, qmodule)
    load_state_dict(model, state_dict, strict=False)
