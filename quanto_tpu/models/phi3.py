"""Phi-3 causal LM in flax NNX.

Phi-3 (HF `transformers/models/phi3/modeling_phi3.py`) is a llama-style
pre-norm decoder whose distinguishing features are FUSED projections:

- `qkv_proj`: one Linear emitting `[q (H*D) | k (Hkv*D) | v (Hkv*D)]` as
  stacked blocks (modeling_phi3.py Phi3Attention.forward slicing) — a single
  quantized matmul per layer where llama has three.
- `gate_up_proj`: one Linear emitting `[gate | up]`, chunked in half
  (Phi3MLP.forward), activation `silu(gate) * up`.
- Optional partial rotary (`partial_rotary_factor`): only the leading
  `rotary_dim` channels of q/k rotate, the tail passes through.
- Optional sliding-window attention applied to ALL layers when
  `config.sliding_window` is set (Phi3Model.forward mask selection).

Standard RMSNorm, untied lm_head by default. Module names mirror the HF
layout (`model.layers.N.self_attn.qkv_proj`, `model.layers.N.mlp.gate_up_proj`)
so checkpoints and include/exclude patterns transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, RMSNorm, _rope, _rotate_half, freeze_rope_scaling


__all__ = ["Phi3Config", "Phi3ForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Phi3Config:
    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 1.0
    sliding_window: Optional[int] = None
    tie_word_embeddings: bool = False
    # HF `rope_scaling` type "longrope" (Phi-3-*-128k checkpoints), stored as
    # a hashable sorted tuple (short_factor/long_factor as tuples); see
    # `freeze_rope_scaling`. The short/long table choice follows HF exactly:
    # long when a request's (max position + 1) exceeds
    # `original_max_position_embeddings`, selected PER BATCH ROW (a traced
    # select, so one compiled program serves both regimes).
    rope_scaling: Optional[tuple] = None
    original_max_position_embeddings: Optional[int] = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_key_value_heads is None:
            object.__setattr__(self, "num_key_value_heads", self.num_attention_heads)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Phi3Config":
        get = lambda k, d=None: getattr(config, k, d)
        rs = get("rope_scaling")
        if rs is not None:
            rtype = rs.get("rope_type", rs.get("type"))
            if rtype != "longrope":
                raise ValueError(f"Phi-3 rope_scaling type {rtype!r} is not supported")
        return cls(
            rope_scaling=freeze_rope_scaling(rs),
            original_max_position_embeddings=get("original_max_position_embeddings"),
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            rms_norm_eps=get("rms_norm_eps", 1e-5),
            rope_theta=get("rope_theta", 10000.0),
            partial_rotary_factor=get("partial_rotary_factor", 1.0),
            sliding_window=get("sliding_window"),
            tie_word_embeddings=get("tie_word_embeddings", False),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _longrope_tables(positions, rotary_dim, c, dtype):
    """Phi-3 longrope cos/sin (HF `_compute_longrope_parameters` +
    `dynamic_rope_update`): per-dim frequency rescale by `short_factor` or
    `long_factor`, chosen per batch row by whether that row's
    max position + 1 exceeds `original_max_position_embeddings`; cos/sin
    scaled by
    sqrt(1 + log(factor)/log(orig)) when the window is extended. The regime
    choice is a traced `jnp.where` over both (cheap [B,T,D]) tables, matching
    HF for every sequence length with one compiled program."""
    import math

    import numpy as np

    s = dict(c.rope_scaling)
    orig = int(c.original_max_position_embeddings or c.max_position_embeddings)
    factor = c.max_position_embeddings / orig
    attn = s.get("attention_factor")
    if attn is None:
        attn = math.sqrt(1.0 + math.log(factor) / math.log(orig)) if factor > 1.0 else 1.0
    pos_freq = c.rope_theta ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    inv_short = jnp.asarray(1.0 / (np.asarray(s["short_factor"], np.float64) * pos_freq), jnp.float32)
    inv_long = jnp.asarray(1.0 / (np.asarray(s["long_factor"], np.float64) * pos_freq), jnp.float32)
    # Regime select PER BATCH ROW (each row is one request's positions):
    # in batched serving the [B] position vector mixes requests at different
    # lengths, and a global max would leak one slot's regime into another's.
    use_long = ((jnp.max(positions, axis=-1) + 1) > orig)[:, None, None]
    pos_f = positions.astype(jnp.float32)[..., None]
    emb_s = jnp.concatenate([pos_f * inv_short, pos_f * inv_short], axis=-1)
    emb_l = jnp.concatenate([pos_f * inv_long, pos_f * inv_long], axis=-1)
    emb = jnp.where(use_long, emb_l, emb_s)
    return (jnp.cos(emb) * attn).astype(dtype), (jnp.sin(emb) * attn).astype(dtype)


def _apply_partial_rope(x, cos, sin):
    """Rotate the leading `rotary_dim = cos.shape[-1]` channels, pass the rest
    (HF phi3 apply_rotary_pos_emb)."""
    rot_dim = cos.shape[-1]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    if x_pass.shape[-1] == 0:
        return x_rot
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class Phi3Attention(nnx.Module):
    def __init__(self, c: Phi3Config, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        op_size = (self.num_heads + 2 * self.num_kv_heads) * self.head_dim
        self.qkv_proj = nnx.Linear(c.hidden_size, op_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.o_proj = nnx.Linear(self.num_heads * self.head_dim, c.hidden_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        B, T, _ = x.shape
        H, Hkv, D = self.num_heads, self.num_kv_heads, self.head_dim
        qkv = _maybe_deq(self.qkv_proj(x))
        q = qkv[..., : H * D].reshape(B, T, H, D)
        k = qkv[..., H * D : (H + Hkv) * D].reshape(B, T, Hkv, D)
        v = qkv[..., (H + Hkv) * D :].reshape(B, T, Hkv, D)
        q = _apply_partial_rope(q, cos, sin)
        k = _apply_partial_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            if causal_ok and T > 1:
                from ..ops.attention import try_flash_prefill

                out = try_flash_prefill(q, k, v, Hkv, D)
                if out is not None:
                    return _maybe_deq(self.o_proj(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        elif causal_ok and T > 1:
            from ..ops.attention import try_flash_prefill

            out = try_flash_prefill(q, k, v, Hkv, D)
            if out is not None:
                return _maybe_deq(self.o_proj(out)), None

        from ..ops.attention import gqa_attention

        q5 = q.reshape(B, T, Hkv, H // Hkv, D)
        out = gqa_attention(q5, k, v, mask, D**-0.5, k_scale=k_scale,
                            v_scale=v_scale, k_shift=k_shift, v_shift=v_shift)
        return _maybe_deq(self.o_proj(out)), new_cache


class Phi3MLP(nnx.Module):
    def __init__(self, c: Phi3Config, rngs: nnx.Rngs):
        self.gate_up_proj = nnx.Linear(c.hidden_size, 2 * c.intermediate_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.down_proj = nnx.Linear(c.intermediate_size, c.hidden_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        gate_up = _maybe_deq(self.gate_up_proj(x))
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return _maybe_deq(self.down_proj(jax.nn.silu(gate) * up))


class Phi3DecoderLayer(nnx.Module):
    def __init__(self, c: Phi3Config, rngs: nnx.Rngs):
        self.self_attn = Phi3Attention(c, rngs)
        self.mlp = Phi3MLP(c, rngs)
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_attention_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos, causal_ok=causal_ok)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Phi3Model(nnx.Module):
    def __init__(self, c: Phi3Config, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([Phi3DecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class Phi3ForCausalLM(nnx.Module):
    """Phi-3 with the `(logits, cache)` decode API shared by the other causal
    families."""

    def __init__(self, config: Phi3Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Phi3Model(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None, cache_pos=0):
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        rotary_dim = int(c.head_dim * c.partial_rotary_factor)
        if c.rope_scaling is not None:
            cos, sin = _longrope_tables(positions, rotary_dim, c, x.dtype)
        else:
            cos, sin = _rope(positions, rotary_dim, c.rope_theta, x.dtype)

        neg = jnp.finfo(jnp.float32).min
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
        keep = k_pos <= q_pos
        if c.sliding_window is not None:
            keep = keep & (k_pos > q_pos - c.sliding_window)
        mask = jnp.where(keep, 0.0, neg)

        new_cache = [] if cache is not None else None
        from ..ops.attention import static_zero_pos

        causal_ok = static_zero_pos(cache_pos) and (
            c.sliding_window is None or c.sliding_window >= T
        )
        for i, layer in enumerate(self.model.layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos, causal_ok=causal_ok)
            if cache is not None:
                new_cache.append(lc)

        x = self.model.norm(x)
        if self.lm_head is None:
            emb = self.model.embed_tokens.embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            logits = x @ emb.T.astype(x.dtype)
        else:
            logits = _maybe_deq(self.lm_head(x))
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        c = self.config
        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            return init_quantized_kv_cache(
                c.num_hidden_layers, batch, max_len, c.num_key_value_heads, c.head_dim, qt
            )
        dtype = dtype or c.dtype
        shape = (batch, max_len, c.num_key_value_heads, c.head_dim)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(c.num_hidden_layers)
        )
