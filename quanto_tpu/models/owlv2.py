"""OWLv2 open-vocabulary object detection in flax NNX.

The torch reference's object-detection example quantizes
`Owlv2ForObjectDetection` (`examples/vision/object-detection/
quantize_owl_model.py:11-50`); this module implements the architecture
natively. HF `transformers/models/owlv2/modeling_owlv2.py` semantics:

- Two CLIP towers: a causal text transformer (pooled at the arg-max token
  id, i.e. the end-of-text token) and a ViT-style vision transformer with a
  class embedding, pre/post layernorms and quick-gelu MLPs; q is scaled by
  head_dim**-0.5 right after the projection.
- Detection grid: post-layernormed patch tokens are multiplied by the
  broadcast class token, layernormed, and reshaped to the patch grid.
- Class head: image embeds projected to the text width, cosine logits
  against the normalized text-query embeds, then a learned per-patch shift
  and (elu+1) scale; padded queries (first token id 0) are masked.
- Box head: 3-layer gelu MLP plus a logit-space bias anchoring each patch's
  box at its grid cell (`compute_box_bias`); sigmoid to cxcywh in [0, 1].
- Objectness head (v2): same MLP shape, scalar output.

Module attribute names mirror the HF layout
(`owlv2.vision_model.encoder.layers.N.self_attn.q_proj`,
`class_head.logit_shift`, ...).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


__all__ = ["Owlv2Config", "Owlv2ForObjectDetection"]


@dataclasses.dataclass(frozen=True)
class Owlv2TowerConfig:
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class Owlv2Config:
    # text tower
    vocab_size: int = 49408
    max_position_embeddings: int = 16
    text: Owlv2TowerConfig = dataclasses.field(default_factory=Owlv2TowerConfig)
    # vision tower
    image_size: int = 960
    patch_size: int = 16
    num_channels: int = 3
    vision: Owlv2TowerConfig = dataclasses.field(
        default_factory=lambda: Owlv2TowerConfig(768, 3072, 12, 12)
    )
    projection_dim: int = 512
    logit_scale_init_value: float = 2.6592
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Owlv2Config":
        t, v = config.text_config, config.vision_config
        tower = lambda c: Owlv2TowerConfig(
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            layer_norm_eps=c.layer_norm_eps,
        )
        return cls(
            vocab_size=t.vocab_size,
            max_position_embeddings=t.max_position_embeddings,
            text=tower(t),
            image_size=v.image_size,
            patch_size=v.patch_size,
            num_channels=v.num_channels,
            vision=tower(v),
            projection_dim=config.projection_dim,
            logit_scale_init_value=getattr(config, "logit_scale_init_value", 2.6592),
            dtype=dtype,
        )

    @property
    def num_patches_side(self) -> int:
        return self.image_size // self.patch_size


def _deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Owlv2Attention(nnx.Module):
    """CLIP attention: q scaled immediately after projection."""

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


class Owlv2MLP(nnx.Module):
    def __init__(self, dim: int, inner: int, dtype, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(dim, inner, param_dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(inner, dim, param_dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return _deq(self.fc2(_quick_gelu(_deq(self.fc1(x)))))


class Owlv2EncoderLayer(nnx.Module):
    def __init__(self, c: Owlv2TowerConfig, dtype, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=dtype, rngs=rngs)
        self.self_attn = Owlv2Attention(c.hidden_size, c.num_attention_heads, dtype, rngs)
        self.layer_norm1 = ln()
        self.mlp = Owlv2MLP(c.hidden_size, c.intermediate_size, dtype, rngs)
        self.layer_norm2 = ln()

    def __call__(self, x, mask=None):
        x = x + self.self_attn(self.layer_norm1(x), mask)
        return x + self.mlp(self.layer_norm2(x))


class Owlv2Encoder(nnx.Module):
    def __init__(self, c: Owlv2TowerConfig, dtype, rngs: nnx.Rngs):
        self.layers = nnx.List(
            [Owlv2EncoderLayer(c, dtype, rngs) for _ in range(c.num_hidden_layers)]
        )

    def __call__(self, x, mask=None):
        for layer in self.layers:
            x = layer(x, mask)
        return x


class Owlv2TextEmbeddings(nnx.Module):
    def __init__(self, c: Owlv2Config, rngs: nnx.Rngs):
        self.token_embedding = nnx.Embed(c.vocab_size, c.text.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.position_embedding = nnx.Embed(
            c.max_position_embeddings, c.text.hidden_size, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, input_ids):
        T = input_ids.shape[1]
        x = self.token_embedding(input_ids)
        return x + self.position_embedding.embedding.get_value()[None, :T].astype(x.dtype)


class Owlv2TextTransformer(nnx.Module):
    def __init__(self, c: Owlv2Config, rngs: nnx.Rngs):
        self.embeddings = Owlv2TextEmbeddings(c, rngs)
        self.encoder = Owlv2Encoder(c.text, c.dtype, rngs)
        self.final_layer_norm = nnx.LayerNorm(
            c.text.hidden_size, epsilon=c.text.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, input_ids, attention_mask=None):
        B, T = input_ids.shape
        x = self.embeddings(input_ids)
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, neg)[None, None]
        if attention_mask is not None:
            mask = mask + jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, neg
            )
        x = self.encoder(x, mask)
        x = self.final_layer_norm(x)
        # Pooled at the highest token id = the end-of-text token (CLIP rule).
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return x, pooled


class Owlv2VisionEmbeddings(nnx.Module):
    def __init__(self, c: Owlv2Config, rngs: nnx.Rngs):
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

    def __call__(self, pixel_values):  # [B, C, H, W]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = _deq(self.patch_embedding(x))
        B, H, W, D = x.shape
        x = x.reshape(B, H * W, D)
        cls = jnp.broadcast_to(self.class_embedding.get_value().astype(x.dtype), (B, 1, D))
        x = jnp.concatenate([cls, x], axis=1)
        return x + self.position_embedding.embedding.get_value()[None, : x.shape[1]].astype(x.dtype)


class Owlv2VisionTransformer(nnx.Module):
    def __init__(self, c: Owlv2Config, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(
            c.vision.hidden_size, epsilon=c.vision.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )
        self.embeddings = Owlv2VisionEmbeddings(c, rngs)
        self.pre_layernorm = ln()
        self.encoder = Owlv2Encoder(c.vision, c.dtype, rngs)
        self.post_layernorm = ln()

    def __call__(self, pixel_values):
        x = self.pre_layernorm(self.embeddings(pixel_values))
        return self.encoder(x)  # last_hidden_state (pre post_layernorm)


class Owlv2Model(nnx.Module):
    def __init__(self, c: Owlv2Config, rngs: nnx.Rngs):
        self.text_model = Owlv2TextTransformer(c, rngs)
        self.vision_model = Owlv2VisionTransformer(c, rngs)
        self.visual_projection = nnx.Linear(
            c.vision.hidden_size, c.projection_dim, use_bias=False, param_dtype=c.dtype, rngs=rngs
        )
        self.text_projection = nnx.Linear(
            c.text.hidden_size, c.projection_dim, use_bias=False, param_dtype=c.dtype, rngs=rngs
        )
        self.logit_scale = nnx.Param(jnp.asarray(c.logit_scale_init_value, c.dtype))


class Owlv2BoxPredictionHead(nnx.Module):
    def __init__(self, width: int, out_dim: int, dtype, rngs: nnx.Rngs):
        self.dense0 = nnx.Linear(width, width, param_dtype=dtype, rngs=rngs)
        self.dense1 = nnx.Linear(width, width, param_dtype=dtype, rngs=rngs)
        self.dense2 = nnx.Linear(width, out_dim, param_dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.gelu(_deq(self.dense0(x)), approximate=False)
        x = jax.nn.gelu(_deq(self.dense1(x)), approximate=False)
        return _deq(self.dense2(x))


class Owlv2ClassPredictionHead(nnx.Module):
    def __init__(self, vision_width: int, text_width: int, dtype, rngs: nnx.Rngs):
        self.dense0 = nnx.Linear(vision_width, text_width, param_dtype=dtype, rngs=rngs)
        self.logit_shift = nnx.Linear(vision_width, 1, param_dtype=dtype, rngs=rngs)
        self.logit_scale = nnx.Linear(vision_width, 1, param_dtype=dtype, rngs=rngs)

    def __call__(self, image_embeds, query_embeds, query_mask=None):
        img = _deq(self.dense0(image_embeds))
        img = img / (jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6).astype(img.dtype)
        q = query_embeds / (
            jnp.linalg.norm(query_embeds.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6
        ).astype(query_embeds.dtype)
        logits = jnp.einsum("bpd,bqd->bpq", img, q)
        shift = _deq(self.logit_shift(image_embeds))
        scale = jax.nn.elu(_deq(self.logit_scale(image_embeds))) + 1
        logits = (logits + shift) * scale
        if query_mask is not None:
            logits = jnp.where(
                query_mask[:, None, :], logits, jnp.finfo(jnp.float32).min
            ).astype(jnp.float32)
        return logits, img


def _box_bias(side: int) -> jnp.ndarray:
    """`compute_box_bias`: logit-space anchors at each patch's grid cell."""
    coords = (jnp.arange(1, side + 1, dtype=jnp.float32)) / side
    xx, yy = jnp.meshgrid(coords, coords, indexing="xy")
    xy = jnp.clip(jnp.stack([xx, yy], -1).reshape(-1, 2), 0.0, 1.0)
    coord_bias = jnp.log(xy + 1e-4) - jnp.log1p(-xy + 1e-4)
    wh = jnp.full_like(xy, 1.0 / side)
    size_bias = jnp.log(wh + 1e-4) - jnp.log1p(-wh + 1e-4)
    return jnp.concatenate([coord_bias, size_bias], axis=-1)


class Owlv2ForObjectDetection(nnx.Module):
    """OWLv2 detector; returns (pred_logits, objectness, pred_boxes) plus
    the query/image embeddings, like the HF output tuple."""

    def __init__(self, config: Owlv2Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        c = config
        self.owlv2 = Owlv2Model(c, rngs)
        self.class_head = Owlv2ClassPredictionHead(
            c.vision.hidden_size, c.text.hidden_size, c.dtype, rngs
        )
        self.box_head = Owlv2BoxPredictionHead(c.vision.hidden_size, 4, c.dtype, rngs)
        self.objectness_head = Owlv2BoxPredictionHead(c.vision.hidden_size, 1, c.dtype, rngs)
        self.layer_norm = nnx.LayerNorm(
            c.vision.hidden_size, epsilon=c.vision.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )

    # --- embedders ---

    def image_embedder(self, pixel_values):
        """Patch-grid image features [B, side*side, D] (HF `image_embedder`)."""
        hidden = self.owlv2.vision_model(pixel_values)
        x = self.owlv2.vision_model.post_layernorm(hidden)
        cls = x[:, :1]
        feats = self.layer_norm(x[:, 1:] * cls)
        return feats

    def text_embedder(self, input_ids, attention_mask=None):
        """Normalized projected text-query embeddings (HF Owlv2Model output)."""
        _, pooled = self.owlv2.text_model(input_ids, attention_mask)
        emb = _deq(self.owlv2.text_projection(pooled))
        return emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)

    # --- detection ---

    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B * num_queries, T]
        pixel_values: jnp.ndarray,  # [B, C, H, W]
        attention_mask: Optional[jnp.ndarray] = None,
    ):
        B = pixel_values.shape[0]
        image_feats = self.image_embedder(pixel_values)
        query_embeds = self.text_embedder(input_ids, attention_mask)
        nq = input_ids.shape[0] // B
        query_embeds = query_embeds.reshape(B, nq, -1)
        query_mask = input_ids.reshape(B, nq, -1)[..., 0] > 0
        pred_logits, class_embeds = self.class_head(image_feats, query_embeds, query_mask)
        objectness = _deq(self.objectness_head(image_feats))[..., 0]
        side = self.config.num_patches_side
        boxes = _deq(self.box_head(image_feats)) + _box_bias(side)[None].astype(image_feats.dtype)
        pred_boxes = jax.nn.sigmoid(boxes)
        return {
            "logits": pred_logits,
            "objectness_logits": objectness,
            "pred_boxes": pred_boxes,
            "text_embeds": query_embeds,
            "class_embeds": class_embeds,
            "image_embeds": image_feats.reshape(B, side, side, -1),
        }
