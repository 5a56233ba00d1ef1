"""PixArt-style diffusion transformer (DiT with cross-attention) in flax NNX.

The torch reference integrates diffusers via
`QuantizedPixArtTransformer2DModel` (`optimum/quanto/models/diffusers_models.py:160-190`),
wrapping `diffusers.PixArtTransformer2DModel`. There is no JAX diffusers, so
this module provides the transformer itself. Attribute names follow the
diffusers state-dict layout (`pos_embed.proj`, `transformer_blocks.N.attn1.to_q`,
`adaln_single.emb.timestep_embedder.linear_1`, ...) so torch-diffusers
checkpoints (and quanto-quantized ones) map 1:1 through
`quanto_tpu.models.loading`.

Linears are `nnx.Linear`, so `quanto_tpu.quantize()` swaps them for QLinears
exactly as it does for LLMs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


__all__ = ["PixArtConfig", "PixArtTransformer2DModel"]


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    sample_size: int = 32  # latent spatial size
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8  # learned-variance epsilon + var
    num_layers: int = 12
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    cross_attention_dim: int = 1152
    caption_channels: int = 4096
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, config: dict, dtype=jnp.float32) -> "PixArtConfig":
        """From a diffusers config dict (config.json of PixArtTransformer2DModel)."""
        get = config.get
        return cls(
            sample_size=get("sample_size", 32),
            patch_size=get("patch_size", 2),
            in_channels=get("in_channels", 4),
            out_channels=get("out_channels", 8),
            num_layers=get("num_layers", 12),
            num_attention_heads=get("num_attention_heads", 16),
            attention_head_dim=get("attention_head_dim", 72),
            cross_attention_dim=get("cross_attention_dim", 1152),
            caption_channels=get("caption_channels", 4096),
            norm_eps=get("norm_eps", 1e-6),
            dtype=dtype,
        )


def _timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _layer_norm(x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class PatchEmbed(nnx.Module):
    """diffusers `PatchEmbed`: conv projection + fixed sincos pos embedding."""

    def __init__(self, c: PixArtConfig, rngs: nnx.Rngs):
        self.proj = nnx.Conv(
            c.in_channels, c.inner_dim, (c.patch_size, c.patch_size),
            strides=c.patch_size, padding="VALID", param_dtype=c.dtype, rngs=rngs,
        )
        self.patch_size = c.patch_size
        n = (c.sample_size // c.patch_size) ** 2
        self.pos_embed = nnx.Variable(
            _get_2d_sincos_pos_embed(c.inner_dim, c.sample_size // c.patch_size).astype(c.dtype)[None]
        )

    def __call__(self, latent):  # [B, H, W, C] NHWC
        x = self.proj(latent)  # [B, H/p, W/p, D]
        B, h, w, D = x.shape
        return x.reshape(B, h * w, D) + self.pos_embed.get_value()


def _get_2d_sincos_pos_embed(dim: int, grid: int) -> jnp.ndarray:
    def _1d(dim_half, pos):
        omega = 1.0 / (10000 ** (jnp.arange(dim_half // 2, dtype=jnp.float32) / (dim_half / 2.0)))
        out = pos[:, None] * omega[None, :]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    coords = jnp.arange(grid, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
    emb_h = _1d(dim // 2, gy.reshape(-1))
    emb_w = _1d(dim // 2, gx.reshape(-1))
    return jnp.concatenate([emb_h, emb_w], axis=1)


class Attention(nnx.Module):
    """diffusers `Attention` (to_q/to_k/to_v/to_out.0 naming)."""

    def __init__(self, dim: int, heads: int, kv_dim: Optional[int], dtype, rngs: nnx.Rngs):
        kv_dim = kv_dim or dim
        self.heads = heads
        self.to_q = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_k = nnx.Linear(kv_dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_v = nnx.Linear(kv_dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_out = nnx.List(
            [nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)]
        )

    def __call__(self, x, context=None):
        context = x if context is None else context
        B, T, D = x.shape
        S = context.shape[1]
        h = self.heads
        hd = D // h
        q = _deq(self.to_q(x)).reshape(B, T, h, hd)
        k = _deq(self.to_k(context)).reshape(B, S, h, hd)
        v = _deq(self.to_v(context)).reshape(B, S, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        return _deq(self.to_out[0](out))


class FeedForward(nnx.Module):
    """diffusers `FeedForward` with gelu-approximate (`ff.net.0.proj`, `ff.net.2`)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs, mult: int = 4):
        class _GELUProj(nnx.Module):
            def __init__(self):
                self.proj = nnx.Linear(dim, dim * mult, use_bias=True, param_dtype=dtype, rngs=rngs)

            def __call__(self, x):
                return jax.nn.gelu(_deq(self.proj(x)), approximate=True)

        self.net = nnx.List(
            [_GELUProj(), None, nnx.Linear(dim * mult, dim, use_bias=True, param_dtype=dtype, rngs=rngs)]
        )

    def __call__(self, x):
        return _deq(self.net[2](self.net[0](x)))


class PixArtBlock(nnx.Module):
    """diffusers `BasicTransformerBlock` with ada_norm_single conditioning."""

    def __init__(self, c: PixArtConfig, rngs: nnx.Rngs):
        dim = c.inner_dim
        self.attn1 = Attention(dim, c.num_attention_heads, None, c.dtype, rngs)
        self.attn2 = Attention(dim, c.num_attention_heads, c.cross_attention_dim, c.dtype, rngs)
        self.ff = FeedForward(dim, c.dtype, rngs)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (6, dim), c.dtype) / dim**0.5
        )
        self.norm_eps = c.norm_eps

    def __call__(self, x, context, timestep_emb):
        # timestep_emb: [B, 6, dim] from adaln_single
        table = self.scale_shift_table.get_value()[None]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            table + timestep_emb, 6, axis=1
        )
        h = _layer_norm(x, self.norm_eps) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h)
        x = x + self.attn2(x, context)
        h = _layer_norm(x, self.norm_eps) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * self.ff(h)
        return x


class TimestepEmbedder(nnx.Module):
    """diffusers `TimestepEmbedding` (`linear_1`, `linear_2`)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        self.dtype = dtype
        self.linear_1 = nnx.Linear(256, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, t):
        e = _timestep_embedding(t, 256).astype(self.dtype)
        e = _deq(self.linear_1(e))
        return _deq(self.linear_2(jax.nn.silu(e)))


class AdaLayerNormSingle(nnx.Module):
    """diffusers `AdaLayerNormSingle` (`emb.timestep_embedder`, `linear`)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        class _Emb(nnx.Module):
            def __init__(self):
                self.timestep_embedder = TimestepEmbedder(dim, dtype, rngs)

        self.emb = _Emb()
        self.linear = nnx.Linear(dim, 6 * dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, t):
        emb = self.emb.timestep_embedder(t)
        return _deq(self.linear(jax.nn.silu(emb))), emb


class CaptionProjection(nnx.Module):
    """diffusers `PixArtAlphaTextProjection` (`linear_1`, `linear_2`)."""

    def __init__(self, in_dim: int, dim: int, dtype, rngs: nnx.Rngs):
        self.linear_1 = nnx.Linear(in_dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, captions):
        h = jax.nn.gelu(_deq(self.linear_1(captions)), approximate=True)
        return _deq(self.linear_2(h))


class PixArtTransformer2DModel(nnx.Module):
    """Latent diffusion transformer: patchify -> N blocks -> unpatchify."""

    def __init__(self, config: PixArtConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        c = config
        self.config = c
        dim = c.inner_dim
        self.pos_embed = PatchEmbed(c, rngs)
        self.transformer_blocks = nnx.List([PixArtBlock(c, rngs) for _ in range(c.num_layers)])
        self.adaln_single = AdaLayerNormSingle(dim, c.dtype, rngs)
        self.caption_projection = CaptionProjection(c.caption_channels, dim, c.dtype, rngs)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (2, dim), c.dtype) / dim**0.5
        )
        self.proj_out = nnx.Linear(
            dim, c.patch_size * c.patch_size * c.out_channels,
            use_bias=True, param_dtype=c.dtype, rngs=rngs,
        )

    def __call__(self, latent, timestep, encoder_hidden_states):
        """latent: [B, H, W, C] (NHWC); timestep: [B]; captions: [B, S, caption_channels].
        Returns [B, H, W, out_channels]."""
        c = self.config
        B, H, W, _ = latent.shape
        x = self.pos_embed(latent)  # [B, T, D]
        cond, emb = self.adaln_single(timestep)  # [B, 6*D], [B, D]
        cond = cond.reshape(B, 6, -1)
        context = self.caption_projection(encoder_hidden_states)
        for block in self.transformer_blocks:
            x = block(x, context, cond)
        shift, scale = jnp.split(
            self.scale_shift_table.get_value()[None] + emb[:, None, :], 2, axis=1
        )
        x = _layer_norm(x, c.norm_eps) * (1 + scale) + shift
        x = _deq(self.proj_out(x))
        # unpatchify: [B, h*w, p*p*C] -> [B, H, W, C]
        p = c.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, h, w, p, p, c.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(B, H, W, c.out_channels)
