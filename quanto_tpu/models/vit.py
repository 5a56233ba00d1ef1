"""ViT image-classification encoder in flax NNX.

The torch reference's vision example quantizes ViT
(`examples/vision/image-classification/pets/quantize_vit_model.py`); this
module implements the architecture natively. HF
`transformers/models/vit/modeling_vit.py` semantics:

- Patch embedding: Conv2d with kernel = stride = patch_size over pixel
  values, flattened to a token sequence; a learned CLS token is prepended
  and learned position embeddings (CLS included) are added.
- Encoder layers are pre-norm: `x += attn(ln_before(x))`, then
  `x += out_dense(gelu(intermediate(ln_after(x))))` — note the second
  residual taps the POST-attention stream (HF `ViTOutput.forward`).
- Attention scores are scaled by head_dim**-0.5; q/k/v carry biases.
- Classification head reads the final-layernormed CLS token only.

Module attribute names mirror the HF layout
(`vit.encoder.layer.N.attention.attention.query`, ...) so
`loading.load_hf_state_dict` maps checkpoints with no renaming table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


__all__ = ["ViTConfig", "ViTForImageClassification"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    num_labels: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "ViTConfig":
        num_labels = getattr(config, "num_labels", None) or len(
            getattr(config, "id2label", {0: None, 1: None})
        )
        return cls(
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            intermediate_size=config.intermediate_size,
            image_size=config.image_size,
            patch_size=config.patch_size,
            num_channels=config.num_channels,
            num_labels=num_labels,
            layer_norm_eps=config.layer_norm_eps,
            dtype=dtype,
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class ViTPatchEmbeddings(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.projection = nnx.Conv(
            c.num_channels,
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            param_dtype=c.dtype,
            rngs=rngs,
        )

    def __call__(self, pixel_values):  # [B, C, H, W] (HF layout)
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC for flax conv
        x = _maybe_deq(self.projection(x))
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D)


class ViTEmbeddings(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.cls_token = nnx.Param(
            jax.random.normal(rngs.params(), (1, 1, c.hidden_size), c.dtype) * 0.02
        )
        self.position_embeddings = nnx.Param(
            jax.random.normal(rngs.params(), (1, c.num_patches + 1, c.hidden_size), c.dtype) * 0.02
        )
        self.patch_embeddings = ViTPatchEmbeddings(c, rngs)

    def __call__(self, pixel_values):
        x = self.patch_embeddings(pixel_values)
        B = x.shape[0]
        cls = jnp.broadcast_to(
            self.cls_token.get_value().astype(x.dtype), (B, 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
        return x + self.position_embeddings.get_value().astype(x.dtype)


class ViTSelfAttention(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        mk = lambda: nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.query = mk()
        self.key = mk()
        self.value = mk()

    def __call__(self, x):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        q = _maybe_deq(self.query(x)).reshape(B, T, H, D)
        k = _maybe_deq(self.key(x)).reshape(B, T, H, D)
        v = _maybe_deq(self.value(x)).reshape(B, T, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D**-0.5), axis=-1).astype(x.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)


class ViTSelfOutput(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        return _maybe_deq(self.dense(x))


class ViTAttention(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.attention = ViTSelfAttention(c, rngs)
        self.output = ViTSelfOutput(c, rngs)

    def __call__(self, x):
        return self.output(self.attention(x))


class ViTIntermediate(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.hidden_size, c.intermediate_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        return jax.nn.gelu(_maybe_deq(self.dense(x)), approximate=False)


class ViTOutput(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.intermediate_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x, residual):
        return _maybe_deq(self.dense(x)) + residual


class ViTLayer(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)
        self.attention = ViTAttention(c, rngs)
        self.intermediate = ViTIntermediate(c, rngs)
        self.output = ViTOutput(c, rngs)
        self.layernorm_before = ln()
        self.layernorm_after = ln()

    def __call__(self, x):
        x = x + self.attention(self.layernorm_before(x))
        # HF ViTOutput: the MLP residual taps the post-attention stream.
        return self.output(self.intermediate(self.layernorm_after(x)), x)


class ViTEncoder(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.layer = nnx.List([ViTLayer(c, rngs) for _ in range(c.num_hidden_layers)])


class ViTModel(nnx.Module):
    def __init__(self, c: ViTConfig, rngs: nnx.Rngs):
        self.embeddings = ViTEmbeddings(c, rngs)
        self.encoder = ViTEncoder(c, rngs)
        self.layernorm = nnx.LayerNorm(
            c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )


class ViTForImageClassification(nnx.Module):
    """ViT with HF-compatible module names; returns classification logits."""

    def __init__(self, config: ViTConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.vit = ViTModel(config, rngs)
        self.classifier = nnx.Linear(
            config.hidden_size, config.num_labels, param_dtype=config.dtype, rngs=rngs
        )

    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        from ..ops.qops import qslice

        x = self.vit.embeddings(pixel_values)
        for layer in self.vit.encoder.layer:
            x = layer(x)
        x = self.vit.layernorm(x)
        # qslice keeps a quantized CLS token quantized (QLayerNorm output
        # quantization feeds the classifier's quantized input path).
        return _maybe_deq(self.classifier(qslice(x, (slice(None), 0))))
