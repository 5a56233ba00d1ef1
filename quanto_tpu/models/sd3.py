"""Stable Diffusion 3 transformer (joint-attention MMDiT) in flax NNX.

Mirrors `diffusers.SD3Transformer2DModel` semantics and state-dict naming
(`pos_embed.proj`, `time_text_embed.timestep_embedder.linear_1`,
`transformer_blocks.N.attn.to_q` / `.add_q_proj`, `norm_out.linear`, ...) so
torch checkpoints map 1:1 through `quanto_tpu.models.loading`. The torch
reference's diffusers wrapper (`optimum/quanto/models/diffusers_models.py:44-157`)
supports this model class; here we also provide the network itself since
there is no JAX diffusers.

Linears are `nnx.Linear`, so `quanto_tpu.quantize()` swaps them for QLinears.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .flux import (
    RMSNorm,
    TimestepEmbedding,
    _attention,
    _deq,
    _layer_norm,
    _timestep_embedding,
    FeedForward,
)


__all__ = ["SD3Config", "SD3Transformer2DModel"]


@dataclasses.dataclass(frozen=True)
class SD3Config:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # "rms_norm" on SD3.5
    dtype: Any = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, config: dict, dtype=jnp.float32) -> "SD3Config":
        get = config.get
        return cls(
            sample_size=get("sample_size", 128),
            patch_size=get("patch_size", 2),
            in_channels=get("in_channels", 16),
            out_channels=get("out_channels", 16),
            num_layers=get("num_layers", 24),
            attention_head_dim=get("attention_head_dim", 64),
            num_attention_heads=get("num_attention_heads", 24),
            joint_attention_dim=get("joint_attention_dim", 4096),
            caption_projection_dim=get("caption_projection_dim", 1536),
            pooled_projection_dim=get("pooled_projection_dim", 2048),
            pos_embed_max_size=get("pos_embed_max_size", 192),
            qk_norm=get("qk_norm"),
            dtype=dtype,
        )

    def to_hf(self) -> dict:
        return {
            "sample_size": self.sample_size,
            "patch_size": self.patch_size,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "num_layers": self.num_layers,
            "attention_head_dim": self.attention_head_dim,
            "num_attention_heads": self.num_attention_heads,
            "joint_attention_dim": self.joint_attention_dim,
            "caption_projection_dim": self.caption_projection_dim,
            "pooled_projection_dim": self.pooled_projection_dim,
            "pos_embed_max_size": self.pos_embed_max_size,
            "qk_norm": self.qk_norm,
        }


def _2d_sincos_pos_embed(dim: int, grid: int) -> jnp.ndarray:
    """diffusers `get_2d_sincos_pos_embed` over a [grid, grid] lattice."""

    def _1d(dim_half, pos):
        omega = 1.0 / (10000 ** (jnp.arange(dim_half // 2, dtype=jnp.float32) / (dim_half / 2.0)))
        out = pos[:, None] * omega[None, :]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    coords = jnp.arange(grid, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
    return jnp.concatenate([_1d(dim // 2, gy.reshape(-1)), _1d(dim // 2, gx.reshape(-1))], axis=1)


class SD3PatchEmbed(nnx.Module):
    """diffusers `PatchEmbed` with `pos_embed_max_size` cropping: the sincos
    table spans the max grid; the active [h, w] window is cropped from its
    center at call time."""

    def __init__(self, c: SD3Config, rngs: nnx.Rngs):
        self.proj = nnx.Conv(
            c.in_channels, c.inner_dim, (c.patch_size, c.patch_size),
            strides=c.patch_size, padding="VALID", param_dtype=c.dtype, rngs=rngs,
        )
        self.patch_size = c.patch_size
        self.max_size = c.pos_embed_max_size
        self.pos_embed = nnx.Variable(
            _2d_sincos_pos_embed(c.inner_dim, c.pos_embed_max_size).astype(c.dtype)[None]
        )

    def __call__(self, latent):  # [B, H, W, C] NHWC
        x = self.proj(latent)
        B, h, w, D = x.shape
        top = (self.max_size - h) // 2
        left = (self.max_size - w) // 2
        table = self.pos_embed.get_value().reshape(1, self.max_size, self.max_size, D)
        pos = table[:, top : top + h, left : left + w].reshape(1, h * w, D)
        return x.reshape(B, h * w, D) + pos


class CombinedTimestepTextProjEmbeddings(nnx.Module):
    """diffusers `CombinedTimestepTextProjEmbeddings` (`timestep_embedder`,
    `text_embedder`), summed."""

    def __init__(self, dim: int, pooled_dim: int, dtype, rngs: nnx.Rngs):
        self.dtype = dtype
        self.timestep_embedder = TimestepEmbedding(256, dim, dtype, rngs)
        self.text_embedder = TimestepEmbedding(pooled_dim, dim, dtype, rngs)

    def __call__(self, timestep, pooled):
        temb = self.timestep_embedder(_timestep_embedding(timestep, 256).astype(self.dtype))
        return temb + self.text_embedder(pooled.astype(self.dtype))


class JointAttention(nnx.Module):
    """diffusers `Attention` in joint (MMDiT) mode: image qkv + text qkv
    (`add_*_proj`), one softmax over the concatenated sequence. The final
    block sets `context_pre_only` (no `to_add_out`)."""

    def __init__(self, c: SD3Config, context_pre_only: bool, rngs: nnx.Rngs):
        dim = c.inner_dim
        self.heads = c.num_attention_heads
        self.head_dim = c.attention_head_dim
        dtype = c.dtype
        self.to_q = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_k = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_v = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.add_q_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.add_k_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.add_v_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_out = nnx.List([nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)])
        if context_pre_only:
            self.to_add_out = None
        else:
            self.to_add_out = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        if c.qk_norm == "rms_norm":
            self.norm_q = RMSNorm(self.head_dim, dtype, rngs)
            self.norm_k = RMSNorm(self.head_dim, dtype, rngs)
            self.norm_added_q = RMSNorm(self.head_dim, dtype, rngs)
            self.norm_added_k = RMSNorm(self.head_dim, dtype, rngs)
        else:
            self.norm_q = self.norm_k = self.norm_added_q = self.norm_added_k = None

    def __call__(self, x, context):
        B, T, D = x.shape
        S = context.shape[1]
        h, hd = self.heads, self.head_dim
        q = _deq(self.to_q(x)).reshape(B, T, h, hd)
        k = _deq(self.to_k(x)).reshape(B, T, h, hd)
        v = _deq(self.to_v(x)).reshape(B, T, h, hd)
        cq = _deq(self.add_q_proj(context)).reshape(B, S, h, hd)
        ck = _deq(self.add_k_proj(context)).reshape(B, S, h, hd)
        cv = _deq(self.add_v_proj(context)).reshape(B, S, h, hd)
        if self.norm_q is not None:
            q, k = self.norm_q(q), self.norm_k(k)
            cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
        # Image tokens lead (diffusers JointAttnProcessor concatenates the
        # sample first, encoder second — the opposite of Flux).
        q = jnp.concatenate([q, cq], axis=1)
        k = jnp.concatenate([k, ck], axis=1)
        v = jnp.concatenate([v, cv], axis=1)
        out = _attention(q, k, v)
        img_out, ctx_out = out[:, :T], out[:, T:]
        img_out = _deq(self.to_out[0](img_out))
        if self.to_add_out is None:
            return img_out, None
        return img_out, _deq(self.to_add_out(ctx_out))


class SD3AdaLayerNormZero(nnx.Module):
    """diffusers `AdaLayerNormZero` (`linear` → 6 modulation terms)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        self.linear = nnx.Linear(dim, 6 * dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, x, temb):
        mods = _deq(self.linear(jax.nn.silu(temb)))[:, None, :]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mods, 6, axis=-1)
        return _layer_norm(x) * (1 + scale_msa) + shift_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp


class SD3AdaLayerNormContinuous(nnx.Module):
    """diffusers `AdaLayerNormContinuous` (`linear` → [scale, shift])."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        self.linear = nnx.Linear(dim, 2 * dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, x, temb):
        mods = _deq(self.linear(jax.nn.silu(temb)))[:, None, :]
        scale, shift = jnp.split(mods, 2, axis=-1)
        return _layer_norm(x) * (1 + scale) + shift


class JointTransformerBlock(nnx.Module):
    """diffusers `JointTransformerBlock`: two residual streams through one
    joint attention; the last block only reads from the context stream."""

    def __init__(self, c: SD3Config, context_pre_only: bool, rngs: nnx.Rngs):
        dim = c.inner_dim
        self.context_pre_only = context_pre_only
        self.norm1 = SD3AdaLayerNormZero(dim, c.dtype, rngs)
        if context_pre_only:
            self.norm1_context = SD3AdaLayerNormContinuous(dim, c.dtype, rngs)
        else:
            self.norm1_context = SD3AdaLayerNormZero(dim, c.dtype, rngs)
        self.attn = JointAttention(c, context_pre_only, rngs)
        self.ff = FeedForward(dim, c.dtype, rngs)
        if context_pre_only:
            self.ff_context = None
        else:
            self.ff_context = FeedForward(dim, c.dtype, rngs)

    def __call__(self, x, context, temb):
        h, gate, shift_mlp, scale_mlp, gate_mlp = self.norm1(x, temb)
        if self.context_pre_only:
            ch = self.norm1_context(context, temb)
        else:
            ch, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(context, temb)
        img_attn, ctx_attn = self.attn(h, ch)
        x = x + gate * img_attn
        x = x + gate_mlp * self.ff(_layer_norm(x) * (1 + scale_mlp) + shift_mlp)
        if self.context_pre_only:
            return x, None
        context = context + c_gate * ctx_attn
        context = context + c_gate_mlp * self.ff_context(
            _layer_norm(context) * (1 + c_scale_mlp) + c_shift_mlp
        )
        return x, context


class SD3Transformer2DModel(nnx.Module):
    """Latent in (NHWC) → noise/velocity prediction out (NHWC)."""

    def __init__(self, config: SD3Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        c = config
        self.config = c
        dim = c.inner_dim
        self.pos_embed = SD3PatchEmbed(c, rngs)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            dim, c.pooled_projection_dim, c.dtype, rngs
        )
        self.context_embedder = nnx.Linear(
            c.joint_attention_dim, c.caption_projection_dim,
            use_bias=True, param_dtype=c.dtype, rngs=rngs,
        )
        self.transformer_blocks = nnx.List(
            [
                JointTransformerBlock(c, context_pre_only=(i == c.num_layers - 1), rngs=rngs)
                for i in range(c.num_layers)
            ]
        )
        self.norm_out = SD3AdaLayerNormContinuous(dim, c.dtype, rngs)
        self.proj_out = nnx.Linear(
            dim, c.patch_size * c.patch_size * c.out_channels,
            use_bias=True, param_dtype=c.dtype, rngs=rngs,
        )

    def __call__(self, hidden_states, encoder_hidden_states, pooled_projections, timestep):
        """hidden_states: [B, H, W, C] NHWC latent; encoder_hidden_states:
        [B, S, joint_attention_dim]; pooled_projections: [B, pooled_dim];
        timestep: [B] (raw scheduler timesteps, as diffusers passes them)."""
        c = self.config
        B, H, W, _ = hidden_states.shape
        x = self.pos_embed(hidden_states)
        temb = self.time_text_embed(timestep.astype(jnp.float32), pooled_projections)
        context = _deq(self.context_embedder(encoder_hidden_states))
        for block in self.transformer_blocks:
            x, context = block(x, context, temb)
        x = self.norm_out(x, temb)
        x = _deq(self.proj_out(x))
        p = c.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, h, w, p, p, c.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(B, H, W, c.out_channels)
