"""Flux diffusion transformer (double-stream + single-stream MMDiT) in flax NNX.

The torch reference's diffusers integration (`optimum/quanto/models/
diffusers_models.py:44-157`) wraps any diffusers transformer; Flux is the
flagship model quanto is most used with (README.md quantizes Flux in the
diffusers ecosystem). There is no JAX diffusers, so this module provides the
transformer itself, mirroring `diffusers.FluxTransformer2DModel` semantics
and state-dict naming (`x_embedder`, `time_text_embed.timestep_embedder.
linear_1`, `transformer_blocks.N.attn.to_q`, `single_transformer_blocks.N.
proj_mlp`, ...) so torch checkpoints map 1:1 through
`quanto_tpu.models.loading`.

Linears are `nnx.Linear`, so `quanto_tpu.quantize()` swaps them for QLinears
exactly as for the LLM families.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx


__all__ = ["FluxConfig", "FluxTransformer2DModel"]


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: Optional[int] = None
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    dtype: Any = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def output_channels(self) -> int:
        return self.out_channels if self.out_channels is not None else self.in_channels

    @classmethod
    def from_hf(cls, config: dict, dtype=jnp.float32) -> "FluxConfig":
        get = config.get
        return cls(
            patch_size=get("patch_size", 1),
            in_channels=get("in_channels", 64),
            out_channels=get("out_channels"),
            num_layers=get("num_layers", 19),
            num_single_layers=get("num_single_layers", 38),
            attention_head_dim=get("attention_head_dim", 128),
            num_attention_heads=get("num_attention_heads", 24),
            joint_attention_dim=get("joint_attention_dim", 4096),
            pooled_projection_dim=get("pooled_projection_dim", 768),
            guidance_embeds=get("guidance_embeds", False),
            axes_dims_rope=tuple(get("axes_dims_rope", (16, 56, 56))),
            dtype=dtype,
        )

    def to_hf(self) -> dict:
        return {
            "patch_size": self.patch_size,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "num_layers": self.num_layers,
            "num_single_layers": self.num_single_layers,
            "attention_head_dim": self.attention_head_dim,
            "num_attention_heads": self.num_attention_heads,
            "joint_attention_dim": self.joint_attention_dim,
            "pooled_projection_dim": self.pooled_projection_dim,
            "guidance_embeds": self.guidance_embeds,
            "axes_dims_rope": list(self.axes_dims_rope),
        }


def _deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _layer_norm(x, eps=1e-6):
    """LayerNorm with elementwise_affine=False (diffusers AdaLayerNorm* norms)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers `Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)`:
    cat([cos, sin])."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class RMSNorm(nnx.Module):
    """diffusers `RMSNorm` (qk-norm over head_dim, learned weight)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs, eps: float = 1e-6):
        self.weight = nnx.Param(jnp.ones((dim,), dtype))
        self.eps = eps

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * self.weight.get_value().astype(jnp.float32)).astype(x.dtype)


class TimestepEmbedding(nnx.Module):
    """diffusers `TimestepEmbedding` (`linear_1`, silu, `linear_2`)."""

    def __init__(self, in_dim: int, dim: int, dtype, rngs: nnx.Rngs):
        self.linear_1 = nnx.Linear(in_dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, e):
        return _deq(self.linear_2(jax.nn.silu(_deq(self.linear_1(e)))))


class CombinedTimestepTextEmbed(nnx.Module):
    """diffusers `CombinedTimestepGuidanceTextProjEmbeddings` /
    `CombinedTimestepTextProjEmbeddings`: 256-d sin/cos → MLPs, summed."""

    def __init__(self, dim: int, pooled_dim: int, guidance: bool, dtype, rngs: nnx.Rngs):
        self.dtype = dtype
        self.timestep_embedder = TimestepEmbedding(256, dim, dtype, rngs)
        self.text_embedder = TimestepEmbedding(pooled_dim, dim, dtype, rngs)
        if guidance:
            self.guidance_embedder = TimestepEmbedding(256, dim, dtype, rngs)
        else:
            self.guidance_embedder = None

    def __call__(self, timestep, pooled, guidance=None):
        temb = self.timestep_embedder(_timestep_embedding(timestep, 256).astype(self.dtype))
        if self.guidance_embedder is not None:
            g = jnp.zeros_like(timestep) if guidance is None else guidance
            temb = temb + self.guidance_embedder(
                _timestep_embedding(g, 256).astype(self.dtype)
            )
        return temb + self.text_embedder(pooled.astype(self.dtype))


def rope_cos_sin(ids: jnp.ndarray, axes_dims: Tuple[int, ...], theta: float = 10000.0):
    """diffusers `FluxPosEmbed`: per-axis 1D rotary tables, concatenated.

    ids: [T, n_axes] float/int positions. Returns (cos, sin) of shape
    [T, head_dim] in the *interleaved* convention (each frequency repeated
    twice, matching `get_1d_rotary_pos_embed(repeat_interleave_real=True)`).
    """
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dims):
        pos = ids[:, i].astype(jnp.float32)
        freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        angles = pos[:, None] * freqs[None, :]  # [T, d/2]
        cos_parts.append(jnp.repeat(jnp.cos(angles), 2, axis=1))
        sin_parts.append(jnp.repeat(jnp.sin(angles), 2, axis=1))
    return jnp.concatenate(cos_parts, axis=1), jnp.concatenate(sin_parts, axis=1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotary: x is [B, T, H, D], cos/sin [T, D]."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + rot * s).astype(x.dtype)


def _attention(q, k, v):
    """[B, T, H, D] SDPA in f32 logits."""
    B, T, H, D = q.shape
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (D**-0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * D)


class FluxAttention(nnx.Module):
    """diffusers `Attention` with `added_kv_proj_dim` (double-stream joint
    attention): image qkv via `to_q/to_k/to_v`, text qkv via `add_*_proj`,
    RMS qk-norms, joint softmax over [text; image]."""

    def __init__(self, dim: int, heads: int, head_dim: int, dtype, rngs: nnx.Rngs):
        self.heads = heads
        self.head_dim = head_dim
        self.to_q = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_k = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_v = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.norm_q = RMSNorm(head_dim, dtype, rngs)
        self.norm_k = RMSNorm(head_dim, dtype, rngs)
        self.add_q_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.add_k_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.add_v_proj = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.norm_added_q = RMSNorm(head_dim, dtype, rngs)
        self.norm_added_k = RMSNorm(head_dim, dtype, rngs)
        self.to_out = nnx.List([nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)])
        self.to_add_out = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, x, context, cos, sin):
        B, T, D = x.shape
        S = context.shape[1]
        h, hd = self.heads, self.head_dim
        q = self.norm_q(_deq(self.to_q(x)).reshape(B, T, h, hd))
        k = self.norm_k(_deq(self.to_k(x)).reshape(B, T, h, hd))
        v = _deq(self.to_v(x)).reshape(B, T, h, hd)
        cq = self.norm_added_q(_deq(self.add_q_proj(context)).reshape(B, S, h, hd))
        ck = self.norm_added_k(_deq(self.add_k_proj(context)).reshape(B, S, h, hd))
        cv = _deq(self.add_v_proj(context)).reshape(B, S, h, hd)
        # Text tokens lead (diffusers concatenates encoder projections first).
        q = apply_rope(jnp.concatenate([cq, q], axis=1), cos, sin)
        k = apply_rope(jnp.concatenate([ck, k], axis=1), cos, sin)
        v = jnp.concatenate([cv, v], axis=1)
        out = _attention(q, k, v)
        ctx_out, img_out = out[:, :S], out[:, S:]
        return _deq(self.to_out[0](img_out)), _deq(self.to_add_out(ctx_out))


class FluxSingleAttention(nnx.Module):
    """Single-stream attention: qkv + qk-norm, no output projection (the
    block's fused `proj_out` handles it)."""

    def __init__(self, dim: int, heads: int, head_dim: int, dtype, rngs: nnx.Rngs):
        self.heads = heads
        self.head_dim = head_dim
        self.to_q = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_k = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.to_v = nnx.Linear(dim, dim, use_bias=True, param_dtype=dtype, rngs=rngs)
        self.norm_q = RMSNorm(head_dim, dtype, rngs)
        self.norm_k = RMSNorm(head_dim, dtype, rngs)

    def __call__(self, x, cos, sin):
        B, T, D = x.shape
        h, hd = self.heads, self.head_dim
        q = apply_rope(self.norm_q(_deq(self.to_q(x)).reshape(B, T, h, hd)), cos, sin)
        k = apply_rope(self.norm_k(_deq(self.to_k(x)).reshape(B, T, h, hd)), cos, sin)
        v = _deq(self.to_v(x)).reshape(B, T, h, hd)
        return _attention(q, k, v)


class AdaLayerNormZero(nnx.Module):
    """diffusers `AdaLayerNormZero` (`linear` producing 6 modulation terms)."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        self.linear = nnx.Linear(dim, 6 * dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, x, temb):
        mods = _deq(self.linear(jax.nn.silu(temb)))[:, None, :]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mods, 6, axis=-1)
        return _layer_norm(x) * (1 + scale_msa) + shift_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp


class FeedForward(nnx.Module):
    """diffusers `FeedForward` gelu-approximate (`net.0.proj`, `net.2`)."""

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


class FluxTransformerBlock(nnx.Module):
    """Double-stream block (`diffusers.FluxTransformerBlock`): separate image
    and text residual streams, joint attention."""

    def __init__(self, c: FluxConfig, rngs: nnx.Rngs):
        dim = c.inner_dim
        self.norm1 = AdaLayerNormZero(dim, c.dtype, rngs)
        self.norm1_context = AdaLayerNormZero(dim, c.dtype, rngs)
        self.attn = FluxAttention(dim, c.num_attention_heads, c.attention_head_dim, c.dtype, rngs)
        self.ff = FeedForward(dim, c.dtype, rngs)
        self.ff_context = FeedForward(dim, c.dtype, rngs)

    def __call__(self, x, context, temb, cos, sin):
        h, gate, shift_mlp, scale_mlp, gate_mlp = self.norm1(x, temb)
        ch, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(context, temb)
        img_attn, ctx_attn = self.attn(h, ch, cos, sin)
        x = x + gate * img_attn
        x = x + gate_mlp * self.ff(_layer_norm(x) * (1 + scale_mlp) + shift_mlp)
        context = context + c_gate * ctx_attn
        context = context + c_gate_mlp * self.ff_context(
            _layer_norm(context) * (1 + c_scale_mlp) + c_shift_mlp
        )
        return x, context


class FluxSingleTransformerBlock(nnx.Module):
    """Single-stream block (`diffusers.FluxSingleTransformerBlock`): parallel
    attention + MLP with a fused output projection."""

    def __init__(self, c: FluxConfig, rngs: nnx.Rngs):
        dim = c.inner_dim
        mlp_dim = 4 * dim

        class _NormSingle(nnx.Module):
            """diffusers `AdaLayerNormZeroSingle` (3 modulation terms)."""

            def __init__(self):
                self.linear = nnx.Linear(dim, 3 * dim, use_bias=True, param_dtype=c.dtype, rngs=rngs)

            def __call__(self, x, temb):
                mods = _deq(self.linear(jax.nn.silu(temb)))[:, None, :]
                shift, scale, gate = jnp.split(mods, 3, axis=-1)
                return _layer_norm(x) * (1 + scale) + shift, gate

        self.norm = _NormSingle()
        self.proj_mlp = nnx.Linear(dim, mlp_dim, use_bias=True, param_dtype=c.dtype, rngs=rngs)
        self.proj_out = nnx.Linear(dim + mlp_dim, dim, use_bias=True, param_dtype=c.dtype, rngs=rngs)
        self.attn = FluxSingleAttention(dim, c.num_attention_heads, c.attention_head_dim, c.dtype, rngs)

    def __call__(self, x, temb, cos, sin):
        h, gate = self.norm(x, temb)
        attn_out = self.attn(h, cos, sin)
        mlp_out = jax.nn.gelu(_deq(self.proj_mlp(h)), approximate=True)
        return x + gate * _deq(self.proj_out(jnp.concatenate([attn_out, mlp_out], axis=-1)))


class AdaLayerNormContinuous(nnx.Module):
    """diffusers `AdaLayerNormContinuous` (`linear` → [scale, shift])."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs):
        self.linear = nnx.Linear(dim, 2 * dim, use_bias=True, param_dtype=dtype, rngs=rngs)

    def __call__(self, x, temb):
        mods = _deq(self.linear(jax.nn.silu(temb)))[:, None, :]
        scale, shift = jnp.split(mods, 2, axis=-1)
        return _layer_norm(x) * (1 + scale) + shift


class FluxTransformer2DModel(nnx.Module):
    """Packed-latent sequence in → velocity prediction out.

    Inputs follow the diffusers calling convention:
    `hidden_states` [B, T_img, in_channels] (already-packed 2x2 latent
    patches), `encoder_hidden_states` [B, T_txt, joint_attention_dim] (T5),
    `pooled_projections` [B, pooled_projection_dim] (CLIP), `timestep` [B]
    in [0, 1] (scaled by 1000 internally, as diffusers does), `img_ids` /
    `txt_ids` [T, 3] rope positions, optional `guidance` [B].
    """

    def __init__(self, config: FluxConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        c = config
        self.config = c
        dim = c.inner_dim
        self.x_embedder = nnx.Linear(c.in_channels, dim, use_bias=True, param_dtype=c.dtype, rngs=rngs)
        self.context_embedder = nnx.Linear(
            c.joint_attention_dim, dim, use_bias=True, param_dtype=c.dtype, rngs=rngs
        )
        self.time_text_embed = CombinedTimestepTextEmbed(
            dim, c.pooled_projection_dim, c.guidance_embeds, c.dtype, rngs
        )
        self.transformer_blocks = nnx.List(
            [FluxTransformerBlock(c, rngs) for _ in range(c.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [FluxSingleTransformerBlock(c, rngs) for _ in range(c.num_single_layers)]
        )
        self.norm_out = AdaLayerNormContinuous(dim, c.dtype, rngs)
        self.proj_out = nnx.Linear(
            dim, c.patch_size * c.patch_size * c.output_channels,
            use_bias=True, param_dtype=c.dtype, rngs=rngs,
        )

    def __call__(
        self,
        hidden_states,
        encoder_hidden_states,
        pooled_projections,
        timestep,
        img_ids,
        txt_ids,
        guidance=None,
    ):
        c = self.config
        x = _deq(self.x_embedder(hidden_states))
        timestep = timestep.astype(jnp.float32) * 1000.0
        if guidance is not None:
            guidance = guidance.astype(jnp.float32) * 1000.0
        temb = self.time_text_embed(timestep, pooled_projections, guidance)
        context = _deq(self.context_embedder(encoder_hidden_states))
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_cos_sin(ids, c.axes_dims_rope)
        for block in self.transformer_blocks:
            x, context = block(x, context, temb, cos, sin)
        x = jnp.concatenate([context, x], axis=1)
        for block in self.single_transformer_blocks:
            x = block(x, temb, cos, sin)
        x = x[:, context.shape[1] :]
        x = self.norm_out(x, temb)
        return _deq(self.proj_out(x))
