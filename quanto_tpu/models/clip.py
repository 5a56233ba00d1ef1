"""CLIP (contrastive text-image) in flax NNX.

Reference behavior: HF `transformers/models/clip/modeling_clip.py`
(`CLIPModel`) — the architecture behind the torch reference's
vision/zero-shot examples and the base of our OWLv2 implementation
(owlv2.py). Semantics:

- Text tower: token + learned position embeddings, pre-norm encoder with
  causal masking, final layernorm, pooled at the end-of-text token —
  `argmax(input_ids)` for legacy configs (`eos_token_id == 2`), else the
  first position equal to `eos_token_id` (modeling_clip.py
  CLIPTextTransformer.forward).
- Vision tower: class token + patch conv + position embeddings,
  `pre_layrnorm` (HF's historical typo, mirrored here so checkpoints load
  by name), encoder, pooled output = `post_layernorm(x[:, 0])`.
- Projections to a shared space, L2 normalization, and
  `logit_scale.exp()`-scaled cosine similarities:
  `logits_per_text = scale * text_embeds @ image_embeds.T`.

Attribute names mirror HF (`text_model.encoder.layers.N.self_attn.q_proj`,
`visual_projection`, `logit_scale`) so checkpoints, include/exclude
patterns, and TP rules transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .owlv2 import _deq, _quick_gelu


__all__ = ["CLIPConfig", "CLIPTowerConfig", "CLIPModel"]


@dataclasses.dataclass(frozen=True)
class CLIPTowerConfig:
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # text tower
    text: CLIPTowerConfig = CLIPTowerConfig()
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    eos_token_id: int = 2
    # vision tower
    vision: CLIPTowerConfig = CLIPTowerConfig(hidden_size=768, intermediate_size=3072, num_attention_heads=12)
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    # joint space
    projection_dim: int = 512
    logit_scale_init_value: float = 2.6592
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "CLIPConfig":
        t, v = config.text_config, config.vision_config
        tower = lambda c: CLIPTowerConfig(
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            layer_norm_eps=getattr(c, "layer_norm_eps", 1e-5),
            hidden_act=getattr(c, "hidden_act", "quick_gelu"),
        )
        return cls(
            text=tower(t),
            vocab_size=t.vocab_size,
            max_position_embeddings=t.max_position_embeddings,
            eos_token_id=getattr(t, "eos_token_id", 2),
            vision=tower(v),
            image_size=v.image_size,
            patch_size=v.patch_size,
            num_channels=getattr(v, "num_channels", 3),
            projection_dim=config.projection_dim,
            logit_scale_init_value=getattr(config, "logit_scale_init_value", 2.6592),
            dtype=dtype,
        )


def _act(name: str):
    if name == "quick_gelu":
        return _quick_gelu
    if name in ("gelu", "gelu_pytorch_tanh"):
        return lambda x: jax.nn.gelu(x, approximate=name == "gelu_pytorch_tanh")
    raise ValueError(f"unsupported CLIP activation {name!r}")


class CLIPAttention(nnx.Module):
    """q scaled immediately after projection (modeling_clip.py CLIPAttention)."""

    def __init__(self, dim: int, heads: int, dtype, rngs: nnx.Rngs):
        self.num_heads = heads
        self.head_dim = dim // heads
        mk = lambda: nnx.Linear(dim, dim, param_dtype=dtype, rngs=rngs)
        self.k_proj, self.v_proj, self.q_proj, self.out_proj = mk(), mk(), mk(), mk()

    def __call__(self, x, mask=None):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        q = (_deq(self.q_proj(x)) * (D**-0.5)).reshape(B, T, H, D)
        k = _deq(self.k_proj(x)).reshape(B, T, H, D)
        v = _deq(self.v_proj(x)).reshape(B, T, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)
        return _deq(self.out_proj(out))


class CLIPMLP(nnx.Module):
    def __init__(self, dim: int, inner: int, act: str, dtype, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(dim, inner, param_dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(inner, dim, param_dtype=dtype, rngs=rngs)
        self._act = act

    def __call__(self, x):
        return _deq(self.fc2(_act(self._act)(_deq(self.fc1(x)))))


class CLIPEncoderLayer(nnx.Module):
    def __init__(self, c: CLIPTowerConfig, dtype, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=dtype, rngs=rngs)
        self.self_attn = CLIPAttention(c.hidden_size, c.num_attention_heads, dtype, rngs)
        self.layer_norm1 = ln()
        self.mlp = CLIPMLP(c.hidden_size, c.intermediate_size, c.hidden_act, dtype, rngs)
        self.layer_norm2 = ln()

    def __call__(self, x, mask=None):
        x = x + self.self_attn(self.layer_norm1(x), mask)
        return x + self.mlp(self.layer_norm2(x))


class CLIPEncoder(nnx.Module):
    def __init__(self, c: CLIPTowerConfig, dtype, rngs: nnx.Rngs):
        self.layers = nnx.List([CLIPEncoderLayer(c, dtype, rngs) for _ in range(c.num_hidden_layers)])

    def __call__(self, x, mask=None):
        for layer in self.layers:
            x = layer(x, mask)
        return x


class CLIPTextEmbeddings(nnx.Module):
    def __init__(self, c: CLIPConfig, rngs: nnx.Rngs):
        self.token_embedding = nnx.Embed(c.vocab_size, c.text.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.position_embedding = nnx.Embed(
            c.max_position_embeddings, c.text.hidden_size, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, input_ids):
        T = input_ids.shape[1]
        x = self.token_embedding(input_ids)
        return x + self.position_embedding.embedding.get_value()[None, :T].astype(x.dtype)


class CLIPTextTransformer(nnx.Module):
    def __init__(self, c: CLIPConfig, rngs: nnx.Rngs):
        self.embeddings = CLIPTextEmbeddings(c, rngs)
        self.encoder = CLIPEncoder(c.text, c.dtype, rngs)
        self.final_layer_norm = nnx.LayerNorm(
            c.text.hidden_size, epsilon=c.text.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )
        self.eos_token_id = c.eos_token_id

    def __call__(self, input_ids, attention_mask=None):
        B, T = input_ids.shape
        x = self.embeddings(input_ids)
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, neg)[None, None]
        if attention_mask is not None:
            mask = mask + jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, neg)
        x = self.encoder(x, mask)
        x = self.final_layer_norm(x)
        if self.eos_token_id == 2:
            # Legacy rule: eot == highest token id.
            eot = jnp.argmax(input_ids, axis=-1)
        else:
            eot = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(B), eot]
        return x, pooled


class CLIPVisionEmbeddings(nnx.Module):
    def __init__(self, c: CLIPConfig, rngs: nnx.Rngs):
        self.class_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (c.vision.hidden_size,), c.dtype)
        )
        self.patch_embedding = nnx.Conv(
            c.num_channels, c.vision.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID", use_bias=False, param_dtype=c.dtype, rngs=rngs,
        )
        n = (c.image_size // c.patch_size) ** 2 + 1
        self.position_embedding = nnx.Embed(n, c.vision.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, pixel_values):  # [B, C, H, W] (torch convention)
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = _deq(self.patch_embedding(x))
        B, H, W, D = x.shape
        x = x.reshape(B, H * W, D)
        cls = jnp.broadcast_to(self.class_embedding.get_value().astype(x.dtype), (B, 1, D))
        x = jnp.concatenate([cls, x], axis=1)
        return x + self.position_embedding.embedding.get_value()[None, : x.shape[1]].astype(x.dtype)


class CLIPVisionTransformer(nnx.Module):
    def __init__(self, c: CLIPConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(
            c.vision.hidden_size, epsilon=c.vision.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )
        self.embeddings = CLIPVisionEmbeddings(c, rngs)
        # HF attribute is literally `pre_layrnorm` (typo kept for checkpoints).
        self.pre_layrnorm = ln()
        self.encoder = CLIPEncoder(c.vision, c.dtype, rngs)
        self.post_layernorm = ln()

    def __call__(self, pixel_values):
        x = self.pre_layrnorm(self.embeddings(pixel_values))
        x = self.encoder(x)
        pooled = self.post_layernorm(x[:, 0])
        return x, pooled


class CLIPModel(nnx.Module):
    """Dual-tower CLIP with contrastive logits.

    `__call__(input_ids, pixel_values)` returns
    `(logits_per_image, logits_per_text, text_embeds, image_embeds)`."""

    def __init__(self, config: CLIPConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.text_model = CLIPTextTransformer(config, rngs)
        self.vision_model = CLIPVisionTransformer(config, rngs)
        self.visual_projection = nnx.Linear(
            config.vision.hidden_size, config.projection_dim, use_bias=False,
            param_dtype=config.dtype, rngs=rngs,
        )
        self.text_projection = nnx.Linear(
            config.text.hidden_size, config.projection_dim, use_bias=False,
            param_dtype=config.dtype, rngs=rngs,
        )
        self.logit_scale = nnx.Param(jnp.asarray(config.logit_scale_init_value, config.dtype))

    def get_text_features(self, input_ids, attention_mask=None):
        _, pooled = self.text_model(input_ids, attention_mask)
        return _deq(self.text_projection(pooled))

    def get_image_features(self, pixel_values):
        _, pooled = self.vision_model(pixel_values)
        return _deq(self.visual_projection(pooled))

    def __call__(self, input_ids, pixel_values, attention_mask=None):
        text_embeds = self.get_text_features(input_ids, attention_mask)
        image_embeds = self.get_image_features(pixel_values)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.get_value()).astype(text_embeds.dtype)
        logits_per_text = (text_embeds @ image_embeds.T) * scale
        return logits_per_text.T, logits_per_text, text_embeds, image_embeds
