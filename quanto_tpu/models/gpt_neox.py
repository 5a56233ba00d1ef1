"""GPT-NeoX (Pythia) causal LM in flax NNX.

GPT-NeoX (HF `transformers/models/gpt_neox/modeling_gpt_neox.py`) differs
from the llama family in four ways:

- Fused `query_key_value` Linear whose output is PER-HEAD interleaved:
  reshape to [B, T, H, 3*D] then split the last dim into q/k/v (chunk(3)
  after the head reshape) — a different layout than BLOOM's [H, 3, D] or
  Phi-3's stacked blocks.
- Partial rotary: only `head_size * rotary_pct` channels rotate (Pythia
  uses rotary_pct=0.25).
- Parallel residual (default): `x = x + attn(ln1(x)) + mlp(ln2(x))`; the
  sequential variant is also supported (`use_parallel_residual=False`).
- torch LayerNorms with bias, biased projections, exact (erf) gelu, and an
  untied `embed_out` head at the top level.

Module names mirror HF (`gpt_neox.layers.N.attention.query_key_value`,
`embed_out`) so checkpoints and include/exclude patterns transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, _rope, _rotate_half


__all__ = ["GPTNeoXConfig", "GPTNeoXForCausalLM"]


@dataclasses.dataclass(frozen=True)
class GPTNeoXConfig:
    vocab_size: int = 50432
    hidden_size: int = 64
    intermediate_size: int = 256
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    rotary_pct: float = 0.25
    rope_theta: float = 10000.0
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    attention_bias: bool = True
    hidden_act: str = "gelu"
    tie_word_embeddings: bool = False
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "GPTNeoXConfig":
        get = lambda k, d=None: getattr(config, k, d)
        if get("rope_scaling") is not None:
            raise ValueError("GPT-NeoX rope_scaling is not supported")
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            rotary_pct=get("rotary_pct", 0.25),
            rope_theta=get("rotary_emb_base", None) or get("rope_theta", 10000.0),
            max_position_embeddings=get("max_position_embeddings", 2048),
            layer_norm_eps=get("layer_norm_eps", 1e-5),
            use_parallel_residual=get("use_parallel_residual", True),
            attention_bias=get("attention_bias", True),
            hidden_act=get("hidden_act", "gelu"),
            tie_word_embeddings=get("tie_word_embeddings", False),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _apply_partial_rope(x, cos, sin):
    rot_dim = cos.shape[-1]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    if x_pass.shape[-1] == 0:
        return x_rot
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported hidden_act {name!r}")


class GPTNeoXAttention(nnx.Module):
    def __init__(self, c: GPTNeoXConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.head_dim = c.head_dim
        self.query_key_value = nnx.Linear(
            c.hidden_size, 3 * c.hidden_size, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs
        )
        self.dense = nnx.Linear(
            c.hidden_size, c.hidden_size, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        # [B, T, H, 3*D] -> per-head q/k/v chunks (HF qkv.chunk(3, dim=-1)
        # after the head reshape).
        qkv = _maybe_deq(self.query_key_value(x)).reshape(B, T, H, 3 * D)
        q, k, v = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
        q = _apply_partial_rope(q, cos, sin)
        k = _apply_partial_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)

        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`):
        # quantized-cache scale factoring + opt-in bf16 softmax chain.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, D ** -0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        return _maybe_deq(self.dense(out)), new_cache


class GPTNeoXMLP(nnx.Module):
    def __init__(self, c: GPTNeoXConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(c.hidden_size, c.intermediate_size, param_dtype=c.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(c.intermediate_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self._act = _act(c.hidden_act)

    def __call__(self, x):
        return _maybe_deq(self.dense_4h_to_h(self._act(_maybe_deq(self.dense_h_to_4h(x)))))


class GPTNeoXLayer(nnx.Module):
    def __init__(self, c: GPTNeoXConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)
        self.input_layernorm = ln()
        self.post_attention_layernorm = ln()
        self.attention = GPTNeoXAttention(c, rngs)
        self.mlp = GPTNeoXMLP(c, rngs)
        self.use_parallel_residual = c.use_parallel_residual

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        attn, new_cache = self.attention(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos)
        if self.use_parallel_residual:
            return x + attn + self.mlp(self.post_attention_layernorm(x)), new_cache
        x = x + attn
        return x + self.mlp(self.post_attention_layernorm(x)), new_cache


class GPTNeoXModel(nnx.Module):
    def __init__(self, c: GPTNeoXConfig, rngs: nnx.Rngs):
        self.embed_in = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([GPTNeoXLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.final_layer_norm = nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)


class GPTNeoXForCausalLM(nnx.Module):
    """GPT-NeoX with an `embed_out` head and the `(logits, cache)` decode API
    shared by the other causal families."""

    def __init__(self, config: GPTNeoXConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.gpt_neox = GPTNeoXModel(config, rngs)
        if config.tie_word_embeddings:
            self.embed_out = None
        else:
            self.embed_out = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None, cache_pos=0):
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.gpt_neox.embed_in(input_ids)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        rotary_dim = int(c.head_dim * c.rotary_pct)
        cos, sin = _rope(positions, rotary_dim, c.rope_theta, x.dtype)

        neg = jnp.finfo(jnp.float32).min
        if cache is None:
            mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, neg)[None, None]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, neg)

        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.gpt_neox.layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)

        x = self.gpt_neox.final_layer_norm(x)
        if self.embed_out is None:
            emb = self.gpt_neox.embed_in.embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            logits = x @ emb.T.astype(x.dtype)
        else:
            logits = _maybe_deq(self.embed_out(x))
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        c = self.config
        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            return init_quantized_kv_cache(
                c.num_hidden_layers, batch, max_len, c.num_attention_heads, c.head_dim, qt
            )
        dtype = dtype or c.dtype
        shape = (batch, max_len, c.num_attention_heads, c.head_dim)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(c.num_hidden_layers)
        )
