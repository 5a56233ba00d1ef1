"""Quantized diffusers-style model wrappers.

Analogue of the reference diffusers integration
(`optimum/quanto/models/diffusers_models.py:44-190`): a wrapper that
quantizes + freezes a diffusion transformer, saves
`model.safetensors` + `quanto_qmap.json` + `config.json` (with the diffusers
`_class_name` field), and restores it — checking that `_class_name` matches
the wrapper's `base_class`, exactly like the reference.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

from ..nn.qmodule import quantize_module
from ..quantize import (
    freeze as freeze_model,
    get_module_by_name,
    quantization_map,
    quantize,
    set_module_by_name,
)
from ..utils.safetensors_io import load_file, save_file, save_sharded
from .loading import hf_state_dict, load_hf_state_dict
from .flux import FluxConfig, FluxTransformer2DModel
from .pixart import PixArtConfig, PixArtTransformer2DModel
from .sd3 import SD3Config, SD3Transformer2DModel
from .unet2d import UNet2DConfig, UNet2DConditionModel
from .transformers_models import QMAP_NAME


__all__ = [
    "QuantizedDiffusersModel",
    "QuantizedPixArtTransformer2DModel",
    "QuantizedFluxTransformer2DModel",
    "QuantizedSD3Transformer2DModel",
    "QuantizedUNet2DConditionModel",
]


class QuantizedDiffusersModel:
    """Wrapper around a quantized NNX diffusion model
    (reference `diffusers_models.py:44-157`)."""

    base_class = None  # NNX model class
    config_class = None
    class_name = None  # diffusers `_class_name`

    def __init__(self, model):
        self._wrapped = model

    def __getattr__(self, name):
        return getattr(self._wrapped, name)

    def __call__(self, *args, **kwargs):
        return self._wrapped(*args, **kwargs)

    @classmethod
    def quantize(cls, model, weights=None, activations=None, optimizer=None,
                 include=None, exclude=None) -> "QuantizedDiffusersModel":
        if cls.base_class is not None and not isinstance(model, cls.base_class):
            raise ValueError(f"The source model must be a {cls.base_class.__name__}")
        quantize(model, weights=weights, activations=activations,
                 optimizer=optimizer, include=include, exclude=exclude)
        freeze_model(model)
        return cls(model)

    @classmethod
    def from_pretrained(
        cls, name_or_path: str, dtype=jnp.float32, revision=None, cache_dir=None
    ) -> "QuantizedDiffusersModel":
        if cls.base_class is None:
            raise ValueError("Quantized models must subclass with a base_class attribute")
        from .hub import resolve_model_path

        directory = resolve_model_path(name_or_path, revision=revision, cache_dir=cache_dir)
        qmap_path = os.path.join(directory, QMAP_NAME)
        if not os.path.exists(qmap_path):
            raise ValueError(
                f"No {QMAP_NAME} found in {directory}: not a quantized model directory."
            )
        with open(qmap_path) as f:
            qmap = json.load(f)
        with open(os.path.join(directory, "config.json")) as f:
            config = json.load(f)
        class_name = config.get("_class_name")
        if cls.class_name is not None and class_name not in (None, cls.class_name):
            # Same check as the reference (`diffusers_models.py:90-96`).
            raise ValueError(
                f"Config class name {class_name!r} does not match {cls.class_name!r}"
            )
        model = cls.base_class(cls.config_class.from_hf(config, dtype=dtype))
        for name, cfg in qmap.items():
            weights = None if cfg["weights"] == "none" else cfg["weights"]
            activations = None if cfg["activations"] == "none" else cfg["activations"]
            try:
                m = get_module_by_name(model, name)
            except (AttributeError, KeyError, IndexError):
                continue
            qmodule = quantize_module(m, weights=weights, activations=activations, optimizer=None)
            if qmodule is not None:
                set_module_by_name(model, name, qmodule)
        from .transformers_models import _load_tensors

        tensors = _load_tensors(directory)  # single-file or sharded index
        load_hf_state_dict(model, tensors, dtype=dtype)
        model._hf_config = config
        return cls(model)

    def save_pretrained(self, directory: str, max_shard_size="5GB") -> None:
        os.makedirs(directory, exist_ok=True)
        config = getattr(self._wrapped, "_hf_config", None)
        if config is None and hasattr(self._wrapped.config, "to_hf"):
            # Synthesize a diffusers-style config from the model dataclass.
            config = {"_class_name": self.class_name, **self._wrapped.config.to_hf()}
        elif config is None:
            c = self._wrapped.config
            config = {
                "_class_name": self.class_name,
                "sample_size": c.sample_size,
                "patch_size": c.patch_size,
                "in_channels": c.in_channels,
                "out_channels": c.out_channels,
                "num_layers": c.num_layers,
                "num_attention_heads": c.num_attention_heads,
                "attention_head_dim": c.attention_head_dim,
                "cross_attention_dim": c.cross_attention_dim,
                "caption_channels": c.caption_channels,
                "norm_eps": c.norm_eps,
            }
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(directory, QMAP_NAME), "w") as f:
            json.dump(quantization_map(self._wrapped), f, indent=2)
        save_sharded(hf_state_dict(self._wrapped), directory, max_shard_size)


class QuantizedPixArtTransformer2DModel(QuantizedDiffusersModel):
    """(reference `diffusers_models.py:160-190`)."""

    base_class = PixArtTransformer2DModel
    config_class = PixArtConfig
    class_name = "PixArtTransformer2DModel"


class QuantizedFluxTransformer2DModel(QuantizedDiffusersModel):
    """Flux double/single-stream MMDiT (the diffusers model quanto is most
    commonly applied to; same wrapper contract as the reference's
    `QuantizedDiffusersModel`, `diffusers_models.py:44-157`)."""

    base_class = FluxTransformer2DModel
    config_class = FluxConfig
    class_name = "FluxTransformer2DModel"


class QuantizedSD3Transformer2DModel(QuantizedDiffusersModel):
    """Stable Diffusion 3 joint-attention MMDiT."""

    base_class = SD3Transformer2DModel
    config_class = SD3Config
    class_name = "SD3Transformer2DModel"


class QuantizedUNet2DConditionModel(QuantizedDiffusersModel):
    """SD-1.5/2.x conditional UNet (the reference's StableDiffusion example
    quantizes this class, `examples/vision/StableDiffusion/
    quantize_StableDiffusion.py:26-33`)."""

    base_class = UNet2DConditionModel
    config_class = UNet2DConfig
    class_name = "UNet2DConditionModel"
