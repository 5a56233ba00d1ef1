"""Quantized model wrappers and checkpoint I/O.

TPU-native analogue of the reference HF integration
(`optimum/quanto/models/transformers_models.py:43-183`): a wrapper class that
quantizes + freezes a causal LM, saves `model.safetensors` +
`quanto_qmap.json` + `config.json`, and restores a quantized model from such
a directory (including directories produced by the torch reference, since the
tensor names and packing are interoperable).

Unlike the reference (which wraps torch modules from transformers), the
models themselves are our NNX implementations (`quanto_tpu.models.llama`,
`quanto_tpu.models.gpt2`), selected by the `model_type` in `config.json`.
"""

from __future__ import annotations

import json
import os
import jax.numpy as jnp

from ..quantize import freeze as freeze_model
from ..quantize import get_module_by_name, quantization_map, quantize, set_module_by_name
from ..nn.qmodule import quantize_module
from ..utils.safetensors_io import LazySafetensors, load_file, save_file, save_sharded
from .loading import hf_state_dict, load_hf_state_dict


__all__ = [
    "QuantizedTransformersModel",
    "QuantizedModelForCausalLM",
    "QuantizedModelForSeq2SeqLM",
    "build_model",
    "from_pretrained_float",
]

QMAP_NAME = "quanto_qmap.json"  # same file name as the reference (`transformers_models.py:48`)


def _build_from_hf_config(hf_config, dtype=jnp.bfloat16, rngs=None):
    """Instantiate the right NNX architecture for a transformers config."""
    from .gpt2 import GPT2Config, GPT2LMHeadModel
    from .llama import LlamaConfig, LlamaForCausalLM
    from .opt import OPTConfig, OPTForCausalLM

    model_type = getattr(hf_config, "model_type", None) or hf_config.get("model_type")
    if model_type in ("llama", "mistral", "qwen2", "gemma"):
        return LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gemma2":
        from .gemma2 import Gemma2Config, Gemma2ForCausalLM

        return Gemma2ForCausalLM(Gemma2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type in ("gemma3_text", "gemma3"):
        from .gemma3 import Gemma3TextConfig, Gemma3ForCausalLM

        # Multimodal gemma3 configs nest the LM under `text_config`.
        text_config = getattr(hf_config, "text_config", None) or hf_config
        return Gemma3ForCausalLM(Gemma3TextConfig.from_hf(text_config, dtype=dtype), rngs=rngs)
    if model_type == "phi3":
        from .phi3 import Phi3Config, Phi3ForCausalLM

        return Phi3ForCausalLM(Phi3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gpt_neox":
        from .gpt_neox import GPTNeoXConfig, GPTNeoXForCausalLM

        return GPTNeoXForCausalLM(GPTNeoXConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "starcoder2":
        from .starcoder2 import Starcoder2Config, Starcoder2ForCausalLM

        return Starcoder2ForCausalLM(Starcoder2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "falcon":
        from .falcon import FalconConfig, FalconForCausalLM

        return FalconForCausalLM(FalconConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen3":
        from .qwen3 import Qwen3Config, Qwen3ForCausalLM

        return Qwen3ForCausalLM(Qwen3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen3_moe":
        from .qwen3 import Qwen3MoeConfig, Qwen3MoeForCausalLM

        return Qwen3MoeForCausalLM(Qwen3MoeConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "deepseek_v3":
        from .deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM

        return DeepseekV3ForCausalLM(DeepseekV3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "mixtral":
        from .mixtral import MixtralConfig, MixtralForCausalLM

        return MixtralForCausalLM(MixtralConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen2_moe":
        from .qwen2_moe import Qwen2MoeConfig, Qwen2MoeForCausalLM

        return Qwen2MoeForCausalLM(Qwen2MoeConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gpt2":
        return GPT2LMHeadModel(GPT2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "opt":
        return OPTForCausalLM(OPTConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type in ("t5", "mt5"):
        from .t5 import T5Config, T5ForConditionalGeneration

        return T5ForConditionalGeneration(T5Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "whisper":
        from .whisper import WhisperConfig, WhisperForConditionalGeneration

        return WhisperForConditionalGeneration(WhisperConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "vit":
        from .vit import ViTConfig, ViTForImageClassification

        return ViTForImageClassification(ViTConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "bert":
        from .bert import BertConfig, BertForSequenceClassification

        return BertForSequenceClassification(BertConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "bloom":
        from .bloom import BloomConfig, BloomForCausalLM

        return BloomForCausalLM(BloomConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "owlv2":
        from .owlv2 import Owlv2Config, Owlv2ForObjectDetection

        return Owlv2ForObjectDetection(Owlv2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "clip":
        from .clip import CLIPConfig, CLIPModel

        return CLIPModel(CLIPConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    raise ValueError(
        f"Unsupported model_type {model_type!r}: supported are llama, mistral, qwen2, gemma, gemma2, mixtral, qwen2_moe, gpt2, opt, t5, mt5, whisper, vit, bert, bloom, owlv2"
    )


def build_model(hf_config, dtype=jnp.bfloat16, rngs=None):
    return _build_from_hf_config(hf_config, dtype=dtype, rngs=rngs)


def _clip_like_synth(hf_name):
    """Builder for the dual-tower contrastive configs (OWLv2 / CLIP)."""

    def build(c):
        import transformers

        def tower(t, extra):
            d = {
                "hidden_size": t.hidden_size,
                "intermediate_size": t.intermediate_size,
                "num_hidden_layers": t.num_hidden_layers,
                "num_attention_heads": t.num_attention_heads,
                "layer_norm_eps": t.layer_norm_eps,
                "attention_dropout": 0.0,
            }
            if hasattr(t, "hidden_act"):
                d["hidden_act"] = t.hidden_act
            d.update(extra)
            return d

        text_extra = {
            "vocab_size": c.vocab_size,
            "max_position_embeddings": c.max_position_embeddings,
        }
        if hasattr(c, "eos_token_id"):
            text_extra["eos_token_id"] = c.eos_token_id
        return getattr(transformers, hf_name)(
            text_config=tower(c.text, text_extra),
            vision_config=tower(c.vision, {
                "image_size": c.image_size, "patch_size": c.patch_size,
                "num_channels": c.num_channels,
            }),
            projection_dim=c.projection_dim,
            logit_scale_init_value=c.logit_scale_init_value,
        )

    return build


def _labels(c):
    return {i: f"LABEL_{i}" for i in range(c.num_labels)}


# (model module, model class, HF config class, extra kwargs fn) — order
# matters: subclasses before their bases. Every identity-named field is
# copied automatically by `_synth_from_signature`; only renames, computed
# values and base-kwargs (id2label) need the extra fn.
_HF_SYNTH_TABLE = (
    (".qwen3", "Qwen3MoeForCausalLM", "Qwen3MoeConfig", None),
    (".qwen3", "Qwen3ForCausalLM", "Qwen3Config", None),
    (".llama", "LlamaForCausalLM", "LlamaConfig", None),
    (".gpt2", "GPT2LMHeadModel", "GPT2Config", None),
    (".gemma2", "Gemma2ForCausalLM", "Gemma2Config", None),
    (".gemma3", "Gemma3ForCausalLM", "Gemma3TextConfig",
     lambda c: {"rope_scaling": (
         {"rope_type": "linear", "factor": c.rope_scaling_factor}
         if c.rope_scaling_factor else None)}),
    (".phi3", "Phi3ForCausalLM", "Phi3Config", None),
    (".gpt_neox", "GPTNeoXForCausalLM", "GPTNeoXConfig",
     lambda c: {"rotary_emb_base": c.rope_theta}),
    (".starcoder2", "Starcoder2ForCausalLM", "Starcoder2Config", None),
    (".deepseek_v3", "DeepseekV3ForCausalLM", "DeepseekV3Config", None),
    (".falcon", "FalconForCausalLM", "FalconConfig", None),
    (".mixtral", "MixtralForCausalLM", "MixtralConfig", None),
    (".qwen2_moe", "Qwen2MoeForCausalLM", "Qwen2MoeConfig", None),
    (".t5", "T5ForConditionalGeneration", "T5Config", None),
    (".whisper", "WhisperForConditionalGeneration", "WhisperConfig", None),
    (".bloom", "BloomForCausalLM", "BloomConfig",
     lambda c: {"n_layer": c.num_hidden_layers, "n_head": c.num_attention_heads}),
    (".bert", "BertForSequenceClassification", "BertConfig",
     lambda c: {"id2label": _labels(c)}),
    (".vit", "ViTForImageClassification", "ViTConfig",
     lambda c: {"id2label": _labels(c)}),
    (".opt", "OPTForCausalLM", "OPTConfig", None),
    (".owlv2", "Owlv2ForObjectDetection", _clip_like_synth("Owlv2Config"), None),
    (".clip", "CLIPModel", _clip_like_synth("CLIPConfig"), None),
)


def _hashable_to_hf(v):
    """Undo the hashable-tuple encoding config fields use so they can live
    in jit cache keys: ((k, v), ...) pairs -> dict, other tuples -> list."""
    if isinstance(v, tuple):
        if v and all(
            isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str) for e in v
        ):
            return {k: _hashable_to_hf(val) for k, val in v}
        return [_hashable_to_hf(e) for e in v]
    return v


# Fields some HF configs consume through **kwargs (PretrainedConfig
# setattr's unknown kwargs), so signature scanning would silently drop
# them: verified examples are Qwen3MoeConfig's head_dim, Starcoder2/Falcon/
# T5/Bloom/OPT's tie_word_embeddings, and T5's decoder_start_token_id —
# all of which change weight shapes or tying on reload if lost.
_BASE_CONFIG_KWARGS = (
    "tie_word_embeddings",
    "decoder_start_token_id",
    "head_dim",
    "sliding_window_pattern",  # Gemma3: moved out of the __init__ signature
)


def _synth_from_signature(c, hf_cls, extra=None):
    """Build an HF config by copying every same-named attribute of our
    dataclass config that appears in `hf_cls.__init__`'s signature (the
    inverse of each family's `Config.from_hf`), plus base-config fields the
    HF class consumes via **kwargs, plus `extra` overrides."""
    import dataclasses
    import inspect
    import logging

    kwargs = {}
    for name, p in inspect.signature(hf_cls.__init__).parameters.items():
        if name == "self" or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if hasattr(c, name):
            kwargs[name] = _hashable_to_hf(getattr(c, name))
    for name in _BASE_CONFIG_KWARGS:
        if name in kwargs or not hasattr(c, name) or getattr(c, name) is None:
            continue
        # Some configs define the field as a read-only derived property
        # (e.g. FalconConfig.head_dim) — setting it would raise.
        prop = getattr(hf_cls, name, None)
        if isinstance(prop, property) and prop.fset is None:
            continue
        kwargs[name] = _hashable_to_hf(getattr(c, name))
    if extra:
        kwargs.update(extra(c))
    # Surface silent drops: our-config fields that land neither via the HF
    # signature nor the kwargs whitelist rot invisibly as transformers moves
    # fields into **kwargs (the sliding_window_pattern case above).
    if dataclasses.is_dataclass(c):
        dropped = [
            f.name
            for f in dataclasses.fields(c)
            if f.name not in kwargs and getattr(c, f.name, None) is not None
        ]
        if dropped:
            logging.getLogger(__name__).debug(
                "%s -> %s: config fields not copied into the synthesized HF "
                "config: %s",
                type(c).__name__,
                hf_cls.__name__,
                sorted(dropped),
            )
    return hf_cls(**kwargs)


def _synthesize_hf_config(model):
    """HF PretrainedConfig equivalent of a quanto_tpu-native model config,
    so `save_pretrained` of a from-config model writes a config.json that
    `from_pretrained` (ours or transformers') can rebuild."""
    import importlib

    import transformers

    c = getattr(model, "config", None)
    if c is None:
        return None
    for mod_name, cls_name, hf_spec, extra in _HF_SYNTH_TABLE:
        mod = importlib.import_module(mod_name, package=__package__)
        cls = getattr(mod, cls_name, None)
        if cls is None or not isinstance(model, cls):
            continue
        if callable(hf_spec) and not isinstance(hf_spec, str):
            return hf_spec(c)
        return _synth_from_signature(c, getattr(transformers, hf_spec), extra)
    return None


def _load_config(directory: str):
    from transformers import AutoConfig

    return AutoConfig.from_pretrained(directory)


def _load_tensors(directory: str):
    """Single-file or sharded-index safetensors, lazily for shards
    (reference `transformers_models.py:142-154` + `shared_dict.py`)."""
    index_path = os.path.join(directory, "model.safetensors.index.json")
    single_path = os.path.join(directory, "model.safetensors")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted({os.path.join(directory, v) for v in index["weight_map"].values()})
        return LazySafetensors.from_files(files)
    if os.path.exists(single_path):
        return load_file(single_path)
    raise FileNotFoundError(f"No model.safetensors(.index.json) found in {directory}")


def from_pretrained_float(
    name_or_path: str, dtype=jnp.bfloat16, revision=None, cache_dir=None
):
    """Load a FLOAT Hugging Face checkpoint into our NNX implementation.

    Accepts a local directory or a hub-id-shaped name resolved through
    `models.hub.resolve_model_path` (reference `ModelHubMixin.from_pretrained`,
    `transformers_models.py:114-127`)."""
    from .hub import resolve_model_path

    directory = resolve_model_path(name_or_path, revision=revision, cache_dir=cache_dir)
    hf_config = _load_config(directory)
    model = _build_from_hf_config(hf_config, dtype=dtype)
    tensors = _load_tensors(directory)
    load_hf_state_dict(model, tensors, dtype=dtype)
    model._hf_config = hf_config
    return model


class QuantizedTransformersModel:
    """Wrapper around a quantized NNX model
    (reference `transformers_models.py:43-179`)."""

    def __init__(self, model):
        self._wrapped = model

    def __getattr__(self, name):
        # Forward anything we don't define to the wrapped model
        # (reference `transformers_models.py:56-62`).
        return getattr(self._wrapped, name)

    def __call__(self, *args, **kwargs):
        return self._wrapped(*args, **kwargs)

    @classmethod
    def quantize(
        cls,
        model,
        weights=None,
        activations=None,
        optimizer=None,
        include=None,
        exclude=None,
    ) -> "QuantizedTransformersModel":
        """Quantize and freeze an NNX model
        (reference `transformers_models.py:68-112`)."""
        quantize(
            model,
            weights=weights,
            activations=activations,
            optimizer=optimizer,
            include=include,
            exclude=exclude,
        )
        freeze_model(model)
        return cls(model)

    @classmethod
    def from_pretrained(
        cls, name_or_path: str, dtype=jnp.bfloat16, revision=None, cache_dir=None
    ) -> "QuantizedTransformersModel":
        """Reload a quantized model saved by `save_pretrained` (ours or the
        torch reference's; reference `transformers_models.py:114-163`).
        Accepts a local directory or a hub id (resolved via `models.hub`)."""
        from .hub import resolve_model_path

        directory = resolve_model_path(name_or_path, revision=revision, cache_dir=cache_dir)
        qmap_path = os.path.join(directory, QMAP_NAME)
        if not os.path.exists(qmap_path):
            raise ValueError(
                f"No {QMAP_NAME} found in {directory}: this is not a quantized model directory."
            )
        with open(qmap_path) as f:
            qmap = json.load(f)
        hf_config = _load_config(directory)
        model = _build_from_hf_config(hf_config, dtype=dtype)
        # Swap quantized modules per the map, then restore tensors.
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
        tensors = _load_tensors(directory)
        load_hf_state_dict(model, tensors, dtype=dtype)
        model._hf_config = hf_config
        return cls(model)

    def save_pretrained(
        self,
        directory: str,
        max_shard_size: str | int = "5GB",
        push_to_hub: bool = False,
        repo_id: str | None = None,
    ) -> None:
        """Write config.json, quanto_qmap.json and model.safetensors
        (reference `transformers_models.py:165-179`). Checkpoints larger
        than `max_shard_size` split into model-XXXXX-of-XXXXX.safetensors
        shards with a model.safetensors.index.json (the transformers
        convention; our loader and the reference's ShardedStateDict both
        read it)."""
        os.makedirs(directory, exist_ok=True)
        hf_config = getattr(self._wrapped, "_hf_config", None)
        if hf_config is None:
            # Model built directly from a quanto_tpu config: synthesize the
            # HF-style config.json so from_pretrained can rebuild it.
            hf_config = _synthesize_hf_config(self._wrapped)
        if hf_config is not None:
            hf_config.save_pretrained(directory)
        with open(os.path.join(directory, QMAP_NAME), "w") as f:
            json.dump(quantization_map(self._wrapped), f, indent=2)
        save_sharded(hf_state_dict(self._wrapped), directory, max_shard_size)
        if push_to_hub:
            self._push_to_hub(directory, repo_id)

    def _push_to_hub(self, directory: str, repo_id: str | None) -> None:
        """Upload a saved checkpoint (reference ModelHubMixin.push_to_hub).
        Requires network access and `huggingface_hub`; raises a clean error
        offline instead of hanging."""
        if repo_id is None:
            raise ValueError("push_to_hub=True requires repo_id")
        from .hub import _offline

        if _offline():
            raise RuntimeError(
                "push_to_hub requested but this environment is offline "
                "(QUANTO_TPU_OFFLINE/HF_HUB_OFFLINE set)."
            )
        try:
            from huggingface_hub import HfApi
        except ImportError as e:
            raise RuntimeError("push_to_hub requires huggingface_hub") from e
        HfApi().upload_folder(folder_path=directory, repo_id=repo_id)


class QuantizedModelForCausalLM(QuantizedTransformersModel):
    """Causal-LM flavor (reference `transformers_models.py:182-183`)."""


class QuantizedModelForSeq2SeqLM(QuantizedTransformersModel):
    """Encoder-decoder flavor (T5/MT5). The reference reaches seq2seq models
    through `optimum-cli quanto quantize --task`; here the wrapper is
    explicit since the NNX architectures are our own."""
