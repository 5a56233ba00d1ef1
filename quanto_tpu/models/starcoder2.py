"""StarCoder2 causal LM in flax NNX.

StarCoder2 (HF `transformers/models/starcoder2/modeling_starcoder2.py`) is a
llama-layout decoder (`model.layers.N.self_attn.{q,k,v,o}_proj`) with:

- torch LayerNorms (with bias) instead of RMSNorm (`norm_epsilon`),
- a plain 2-layer MLP `c_fc -> gelu_pytorch_tanh -> c_proj` (no gating),
- biases on every projection (`use_bias=True`),
- GQA + rope, optional all-layer sliding window.

Module names mirror HF so checkpoints, include/exclude patterns and
`LLAMA_TP_RULES` (attention projections) transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, _apply_rope, _rope


__all__ = ["Starcoder2Config", "Starcoder2ForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Starcoder2Config:
    vocab_size: int = 49152
    hidden_size: int = 3072
    intermediate_size: int = 12288
    num_hidden_layers: int = 30
    num_attention_heads: int = 24
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    norm_epsilon: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: Optional[int] = None
    use_bias: bool = True
    hidden_act: str = "gelu_pytorch_tanh"
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_key_value_heads is None:
            object.__setattr__(self, "num_key_value_heads", self.num_attention_heads)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Starcoder2Config":
        get = lambda k, d=None: getattr(config, k, d)
        if get("rope_scaling") is not None:
            raise ValueError("StarCoder2 rope_scaling is not supported")
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            norm_epsilon=get("norm_epsilon", 1e-5),
            rope_theta=get("rope_theta", 10000.0),
            sliding_window=get("sliding_window"),
            use_bias=get("use_bias", True),
            hidden_act=get("hidden_act", "gelu_pytorch_tanh"),
            tie_word_embeddings=get("tie_word_embeddings", False),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class Starcoder2Attention(nnx.Module):
    def __init__(self, c: Starcoder2Config, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        lin = lambda i, o: nnx.Linear(i, o, use_bias=c.use_bias, param_dtype=c.dtype, rngs=rngs)
        self.q_proj = lin(c.hidden_size, self.num_heads * self.head_dim)
        self.k_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.v_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.o_proj = lin(self.num_heads * self.head_dim, c.hidden_size)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        B, T, _ = x.shape
        H, Hkv, D = self.num_heads, self.num_kv_heads, self.head_dim
        q = _maybe_deq(self.q_proj(x)).reshape(B, T, H, D)
        k = _maybe_deq(self.k_proj(x)).reshape(B, T, Hkv, D)
        v = _maybe_deq(self.v_proj(x)).reshape(B, T, Hkv, D)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

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


class Starcoder2MLP(nnx.Module):
    def __init__(self, c: Starcoder2Config, rngs: nnx.Rngs):
        self.c_fc = nnx.Linear(c.hidden_size, c.intermediate_size, use_bias=c.use_bias, param_dtype=c.dtype, rngs=rngs)
        self.c_proj = nnx.Linear(c.intermediate_size, c.hidden_size, use_bias=c.use_bias, param_dtype=c.dtype, rngs=rngs)
        self._approx = c.hidden_act in ("gelu_pytorch_tanh", "gelu_new", "gelu_fast")

    def __call__(self, x):
        h = jax.nn.gelu(_maybe_deq(self.c_fc(x)), approximate=self._approx)
        return _maybe_deq(self.c_proj(h))


class Starcoder2DecoderLayer(nnx.Module):
    def __init__(self, c: Starcoder2Config, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.norm_epsilon, param_dtype=c.dtype, rngs=rngs)
        self.self_attn = Starcoder2Attention(c, rngs)
        self.mlp = Starcoder2MLP(c, rngs)
        self.input_layernorm = ln()
        self.post_attention_layernorm = ln()

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos, causal_ok=causal_ok)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Starcoder2Model(nnx.Module):
    def __init__(self, c: Starcoder2Config, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([Starcoder2DecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = nnx.LayerNorm(c.hidden_size, epsilon=c.norm_epsilon, param_dtype=c.dtype, rngs=rngs)


class Starcoder2ForCausalLM(nnx.Module):
    """StarCoder2 with the `(logits, cache)` decode API shared by the other
    causal families."""

    def __init__(self, config: Starcoder2Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Starcoder2Model(config, rngs)
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
        cos, sin = _rope(positions, c.head_dim, c.rope_theta, x.dtype)

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
