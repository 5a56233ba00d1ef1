"""Stable-Diffusion UNet (UNet2DConditionModel) in flax NNX.

The torch reference's StableDiffusion example quantizes `pipe.unet`
(`examples/vision/StableDiffusion/quantize_StableDiffusion.py:26-33`, the
SD-1.5 `UNet2DConditionModel`); this module implements that architecture
natively — the conv-heavy counterpart of the DiT families (pixart/flux/sd3),
and the main exerciser of QConv2d at scale. diffusers
`models/unets/unet_2d_condition.py` semantics:

- conv_in → time embedding (sinusoidal `Timesteps` → `TimestepEmbedding`
  MLP) → down blocks (ResNet stacks with optional cross-attention
  transformers, stride-2 conv downsample) → mid block → up blocks (skip
  concatenation from the down path, nearest-2x upsample) → GroupNorm/SiLU →
  conv_out.
- `ResnetBlock2D`: GN→SiLU→conv, +time-emb projection, GN→SiLU→conv,
  1x1 shortcut on channel change.
- `Transformer2DModel`: GN, proj_in (1x1 conv for SD1.5,
  `use_linear_projection` Linear for SD2.x), `BasicTransformerBlock`s
  (self-attn, cross-attn over the text encoding, GEGLU feed-forward),
  proj_out, residual.
- `attention_head_dim` is, per diffusers' historical naming, the number of
  heads for this model class.

Module attribute names mirror the diffusers layout
(`down_blocks.N.resnets.M.conv1`, `...attentions.M.transformer_blocks.0.
attn1.to_q`, `ff.net.0.proj`, ...) so SD checkpoints map 1:1 through
`loading.load_hf_state_dict`. Compute runs NHWC internally (TPU-native
conv layout); the public interface takes NCHW like diffusers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .flux import TimestepEmbedding, _deq, _timestep_embedding


__all__ = ["UNet2DConfig", "UNet2DConditionModel"]


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # = num heads (diffusers historical naming)
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config: dict, dtype=jnp.float32) -> "UNet2DConfig":
        get = config.get
        return cls(
            sample_size=get("sample_size", 64),
            in_channels=get("in_channels", 4),
            out_channels=get("out_channels", 4),
            down_block_types=tuple(get("down_block_types", cls.down_block_types)),
            up_block_types=tuple(get("up_block_types", cls.up_block_types)),
            block_out_channels=tuple(get("block_out_channels", cls.block_out_channels)),
            layers_per_block=get("layers_per_block", 2),
            cross_attention_dim=get("cross_attention_dim", 768),
            attention_head_dim=get("attention_head_dim", 8),
            norm_num_groups=get("norm_num_groups", 32),
            use_linear_projection=get("use_linear_projection", False),
            dtype=dtype,
        )

    def to_hf(self) -> dict:
        return {
            "sample_size": self.sample_size,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "down_block_types": list(self.down_block_types),
            "up_block_types": list(self.up_block_types),
            "block_out_channels": list(self.block_out_channels),
            "layers_per_block": self.layers_per_block,
            "cross_attention_dim": self.cross_attention_dim,
            "attention_head_dim": self.attention_head_dim,
            "norm_num_groups": self.norm_num_groups,
            "use_linear_projection": self.use_linear_projection,
        }


def _conv(in_ch, out_ch, k, stride, pad, dtype, rngs):
    return nnx.Conv(
        in_ch, out_ch, kernel_size=(k, k), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), param_dtype=dtype, rngs=rngs,
    )


def _gn(ch, groups, eps, dtype, rngs):
    return nnx.GroupNorm(ch, num_groups=groups, epsilon=eps, param_dtype=dtype, rngs=rngs)


class Identity(nnx.Module):
    """Placeholder for parameter-free torch modules (Dropout) so list
    indices in attribute paths line up with the diffusers state dict."""

    def __call__(self, x):
        return x


class ResnetBlock2D(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: int, groups: int, dtype, rngs: nnx.Rngs):
        self.norm1 = _gn(in_ch, groups, 1e-5, dtype, rngs)
        self.conv1 = _conv(in_ch, out_ch, 3, 1, 1, dtype, rngs)
        self.time_emb_proj = nnx.Linear(temb_ch, out_ch, param_dtype=dtype, rngs=rngs)
        self.norm2 = _gn(out_ch, groups, 1e-5, dtype, rngs)
        self.conv2 = _conv(out_ch, out_ch, 3, 1, 1, dtype, rngs)
        self.conv_shortcut = (
            _conv(in_ch, out_ch, 1, 1, 0, dtype, rngs) if in_ch != out_ch else None
        )

    def __call__(self, x, temb):  # x NHWC, temb [B, temb_ch]
        h = _deq(self.conv1(jax.nn.silu(self.norm1(x))))
        h = h + _deq(self.time_emb_proj(jax.nn.silu(temb)))[:, None, None, :].astype(h.dtype)
        h = _deq(self.conv2(jax.nn.silu(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = _deq(self.conv_shortcut(x))
        return x + h


class CrossAttention(nnx.Module):
    """diffusers `Attention`: bias-free q/k/v, biased to_out.0."""

    def __init__(self, dim: int, ctx_dim: int, heads: int, dtype, rngs: nnx.Rngs):
        self.heads = heads
        self.head_dim = dim // heads
        lin = lambda i, o, b: nnx.Linear(i, o, use_bias=b, param_dtype=dtype, rngs=rngs)
        self.to_q = lin(dim, dim, False)
        self.to_k = lin(ctx_dim, dim, False)
        self.to_v = lin(ctx_dim, dim, False)
        self.to_out = nnx.List([lin(dim, dim, True), Identity()])

    def __call__(self, x, context=None):
        ctx = x if context is None else context
        B, T, C = x.shape
        S = ctx.shape[1]
        H, D = self.heads, self.head_dim
        q = _deq(self.to_q(x)).reshape(B, T, H, D)
        k = _deq(self.to_k(ctx)).reshape(B, S, H, D)
        v = _deq(self.to_v(ctx)).reshape(B, S, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (D**-0.5), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)
        return _deq(self.to_out[0](out))


class GEGLU(nnx.Module):
    def __init__(self, dim: int, inner: int, dtype, rngs: nnx.Rngs):
        self.proj = nnx.Linear(dim, 2 * inner, param_dtype=dtype, rngs=rngs)

    def __call__(self, x):
        h, gate = jnp.split(_deq(self.proj(x)), 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nnx.Module):
    """diffusers `FeedForward` with GEGLU: net = [GEGLU, Dropout, Linear]."""

    def __init__(self, dim: int, dtype, rngs: nnx.Rngs, mult: int = 4):
        inner = dim * mult
        self.net = nnx.List([
            GEGLU(dim, inner, dtype, rngs),
            Identity(),
            nnx.Linear(inner, dim, param_dtype=dtype, rngs=rngs),
        ])

    def __call__(self, x):
        return _deq(self.net[2](self.net[1](self.net[0](x))))


class BasicTransformerBlock(nnx.Module):
    def __init__(self, dim: int, ctx_dim: int, heads: int, dtype, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(dim, epsilon=1e-5, param_dtype=dtype, rngs=rngs)
        self.norm1 = ln()
        self.attn1 = CrossAttention(dim, dim, heads, dtype, rngs)
        self.norm2 = ln()
        self.attn2 = CrossAttention(dim, ctx_dim, heads, dtype, rngs)
        self.norm3 = ln()
        self.ff = FeedForward(dim, dtype, rngs)

    def __call__(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nnx.Module):
    def __init__(self, ch: int, ctx_dim: int, heads: int, groups: int,
                 use_linear_projection: bool, dtype, rngs: nnx.Rngs):
        self.norm = _gn(ch, groups, 1e-6, dtype, rngs)
        self._linear_proj = use_linear_projection
        if use_linear_projection:
            self.proj_in = nnx.Linear(ch, ch, param_dtype=dtype, rngs=rngs)
            self.proj_out = nnx.Linear(ch, ch, param_dtype=dtype, rngs=rngs)
        else:
            self.proj_in = _conv(ch, ch, 1, 1, 0, dtype, rngs)
            self.proj_out = _conv(ch, ch, 1, 1, 0, dtype, rngs)
        self.transformer_blocks = nnx.List(
            [BasicTransformerBlock(ch, ctx_dim, heads, dtype, rngs)]
        )

    def __call__(self, x, context):  # x NHWC
        B, H, W, C = x.shape
        residual = x
        h = self.norm(x)
        if self._linear_proj:
            h = h.reshape(B, H * W, C)
            h = _deq(self.proj_in(h))
        else:
            h = _deq(self.proj_in(h)).reshape(B, H * W, C)
        for block in self.transformer_blocks:
            h = block(h, context)
        if self._linear_proj:
            h = _deq(self.proj_out(h)).reshape(B, H, W, C)
        else:
            h = _deq(self.proj_out(h.reshape(B, H, W, C)))
        return h + residual


class Downsample2D(nnx.Module):
    def __init__(self, ch: int, dtype, rngs: nnx.Rngs):
        self.conv = _conv(ch, ch, 3, 2, 1, dtype, rngs)

    def __call__(self, x):
        return _deq(self.conv(x))


class Upsample2D(nnx.Module):
    def __init__(self, ch: int, dtype, rngs: nnx.Rngs):
        self.conv = _conv(ch, ch, 3, 1, 1, dtype, rngs)

    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return _deq(self.conv(x))


class DownBlock2D(nnx.Module):
    def __init__(self, c: UNet2DConfig, in_ch: int, out_ch: int, temb_ch: int,
                 cross_attn: bool, add_downsample: bool, rngs: nnx.Rngs):
        g, dt = c.norm_num_groups, c.dtype
        self.resnets = nnx.List([
            ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_ch, g, dt, rngs)
            for i in range(c.layers_per_block)
        ])
        self.attentions = (
            nnx.List([
                Transformer2DModel(out_ch, c.cross_attention_dim, c.attention_head_dim,
                                   g, c.use_linear_projection, dt, rngs)
                for _ in range(c.layers_per_block)
            ])
            if cross_attn
            else None
        )
        self.downsamplers = nnx.List([Downsample2D(out_ch, dt, rngs)]) if add_downsample else None

    def __call__(self, x, temb, context):
        states = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
            states.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states.append(x)
        return x, states


class UpBlock2D(nnx.Module):
    def __init__(self, c: UNet2DConfig, in_ch: int, prev_ch: int, out_ch: int, temb_ch: int,
                 cross_attn: bool, add_upsample: bool, rngs: nnx.Rngs):
        g, dt = c.norm_num_groups, c.dtype
        n = c.layers_per_block + 1
        resnets = []
        for i in range(n):
            skip_ch = in_ch if i == n - 1 else out_ch
            res_in = prev_ch if i == 0 else out_ch
            resnets.append(ResnetBlock2D(res_in + skip_ch, out_ch, temb_ch, g, dt, rngs))
        self.resnets = nnx.List(resnets)
        self.attentions = (
            nnx.List([
                Transformer2DModel(out_ch, c.cross_attention_dim, c.attention_head_dim,
                                   g, c.use_linear_projection, dt, rngs)
                for _ in range(n)
            ])
            if cross_attn
            else None
        )
        self.upsamplers = nnx.List([Upsample2D(out_ch, dt, rngs)]) if add_upsample else None

    def __call__(self, x, skips, temb, context):
        for i, resnet in enumerate(self.resnets):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNetMidBlock2DCrossAttn(nnx.Module):
    def __init__(self, c: UNet2DConfig, ch: int, temb_ch: int, rngs: nnx.Rngs):
        g, dt = c.norm_num_groups, c.dtype
        self.resnets = nnx.List([
            ResnetBlock2D(ch, ch, temb_ch, g, dt, rngs),
            ResnetBlock2D(ch, ch, temb_ch, g, dt, rngs),
        ])
        self.attentions = nnx.List([
            Transformer2DModel(ch, c.cross_attention_dim, c.attention_head_dim,
                               g, c.use_linear_projection, dt, rngs)
        ])

    def __call__(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class UNet2DConditionModel(nnx.Module):
    """SD-1.5/2.x-class conditional UNet; NCHW interface like diffusers."""

    def __init__(self, config: UNet2DConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        c = config
        self.config = c
        dt = c.dtype
        b = c.block_out_channels
        temb_ch = 4 * b[0]
        self.conv_in = _conv(c.in_channels, b[0], 3, 1, 1, dt, rngs)
        self.time_embedding = TimestepEmbedding(b[0], temb_ch, dt, rngs)
        down = []
        ch = b[0]
        for i, kind in enumerate(c.down_block_types):
            out_ch = b[i]
            down.append(DownBlock2D(
                c, ch, out_ch, temb_ch,
                cross_attn=(kind == "CrossAttnDownBlock2D"),
                add_downsample=(i < len(b) - 1),
                rngs=rngs,
            ))
            ch = out_ch
        self.down_blocks = nnx.List(down)
        self.mid_block = UNetMidBlock2DCrossAttn(c, b[-1], temb_ch, rngs)
        up = []
        rev = list(reversed(b))
        prev_ch = rev[0]
        for i, kind in enumerate(c.up_block_types):
            out_ch = rev[i]
            in_ch = rev[min(i + 1, len(b) - 1)]
            up.append(UpBlock2D(
                c, in_ch, prev_ch, out_ch, temb_ch,
                cross_attn=(kind == "CrossAttnUpBlock2D"),
                add_upsample=(i < len(b) - 1),
                rngs=rngs,
            ))
            prev_ch = out_ch
        self.up_blocks = nnx.List(up)
        self.conv_norm_out = _gn(b[0], c.norm_num_groups, 1e-5, dt, rngs)
        self.conv_out = _conv(b[0], c.out_channels, 3, 1, 1, dt, rngs)

    def __call__(
        self,
        sample: jnp.ndarray,  # [B, C, H, W] latents (diffusers layout)
        timestep,
        encoder_hidden_states: jnp.ndarray,  # [B, S, cross_attention_dim]
    ) -> jnp.ndarray:
        c = self.config
        B = sample.shape[0]
        t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (B,))
        temb = self.time_embedding(
            _timestep_embedding(t, c.block_out_channels[0]).astype(c.dtype)
        )
        x = jnp.transpose(sample, (0, 2, 3, 1))  # NHWC
        x = _deq(self.conv_in(x))
        skips = [x]
        for block in self.down_blocks:
            x, states = block(x, temb, encoder_hidden_states)
            skips.extend(states)
        x = self.mid_block(x, temb, encoder_hidden_states)
        for block in self.up_blocks:
            x = block(x, skips, temb, encoder_hidden_states)
        x = _deq(self.conv_out(jax.nn.silu(self.conv_norm_out(x))))
        return jnp.transpose(x, (0, 3, 1, 2))  # back to NCHW
