"""OPT causal LM in flax NNX.

OPT (facebook/opt-*) is the torch reference's end-to-end test model
(`tests/models/test_quantized_model_for_causal_lm.py:11-73` uses OPT-125m),
so first-class support matters for parity. Architecture: learned positional
embeddings with a +2 offset, pre-norm decoder layers (LayerNorm, not RMS),
standard multi-head attention with biases, ReLU MLP, tied LM head, and an
optional word-embedding projection (opt-350m).

Module attribute names follow the HF layout (`model.decoder.layers.N.
self_attn.q_proj`, ...) so quantization maps, include/exclude patterns and
serialized state dicts transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache


__all__ = ["OPTConfig", "OPTForCausalLM"]

_POS_OFFSET = 2  # OPTLearnedPositionalEmbedding offset


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None
    do_layer_norm_before: bool = True
    enable_bias: bool = True
    layer_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.word_embed_proj_dim is None:
            object.__setattr__(self, "word_embed_proj_dim", self.hidden_size)

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "OPTConfig":
        get = lambda k, d=None: getattr(config, k, d)
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            ffn_dim=config.ffn_dim,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            max_position_embeddings=config.max_position_embeddings,
            word_embed_proj_dim=get("word_embed_proj_dim"),
            do_layer_norm_before=get("do_layer_norm_before", True),
            enable_bias=get("enable_bias", True),
            tie_word_embeddings=get("tie_word_embeddings", True),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class OPTAttention(nnx.Module):
    def __init__(self, config: OPTConfig, rngs: nnx.Rngs):
        c = config
        self.num_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        mk = lambda: nnx.Linear(
            c.hidden_size, c.hidden_size, use_bias=c.enable_bias,
            param_dtype=c.dtype, rngs=rngs,
        )
        self.q_proj, self.k_proj, self.v_proj, self.out_proj = mk(), mk(), mk(), mk()

    def __call__(self, x, mask, layer_cache=None, cache_pos=None):
        B, T, C = x.shape
        q = _maybe_deq(self.q_proj(x)).reshape(B, T, self.num_heads, self.head_dim)
        k = _maybe_deq(self.k_proj(x)).reshape(B, T, self.num_heads, self.head_dim)
        v = _maybe_deq(self.v_proj(x)).reshape(B, T, self.num_heads, self.head_dim)
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..ops.attention import try_flash_decode
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            if T == 1:
                out = try_flash_decode(q, new_cache, cache_pos, self.num_heads, self.head_dim)
                if out is not None:
                    return _maybe_deq(self.out_proj(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`):
        # quantized-cache scale factoring + opt-in bf16 softmax chain.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, self.head_dim ** -0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        return _maybe_deq(self.out_proj(out)), new_cache


class OPTDecoderLayer(nnx.Module):
    def __init__(self, config: OPTConfig, rngs: nnx.Rngs):
        c = config
        self.self_attn = OPTAttention(c, rngs)
        self.self_attn_layer_norm = nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)
        self.fc1 = nnx.Linear(c.hidden_size, c.ffn_dim, use_bias=c.enable_bias, param_dtype=c.dtype, rngs=rngs)
        self.fc2 = nnx.Linear(c.ffn_dim, c.hidden_size, use_bias=c.enable_bias, param_dtype=c.dtype, rngs=rngs)
        self.final_layer_norm = nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)
        self.do_layer_norm_before = c.do_layer_norm_before

    def __call__(self, x, mask, layer_cache=None, cache_pos=None):
        residual = x
        h = self.self_attn_layer_norm(x) if self.do_layer_norm_before else x
        h, new_cache = self.self_attn(h, mask, layer_cache, cache_pos)
        x = residual + h
        if not self.do_layer_norm_before:
            x = self.self_attn_layer_norm(x)
        residual = x
        h = self.final_layer_norm(x) if self.do_layer_norm_before else x
        h = _maybe_deq(self.fc2(jax.nn.relu(_maybe_deq(self.fc1(h)))))
        x = residual + h
        if not self.do_layer_norm_before:
            x = self.final_layer_norm(x)
        return x, new_cache


class OPTDecoder(nnx.Module):
    def __init__(self, config: OPTConfig, rngs: nnx.Rngs):
        c = config
        self.embed_tokens = nnx.Embed(c.vocab_size, c.word_embed_proj_dim, param_dtype=c.dtype, rngs=rngs)
        # Learned positions with the OPT +2 offset baked into the table size.
        self.embed_positions = nnx.Embed(
            c.max_position_embeddings + _POS_OFFSET, c.hidden_size, param_dtype=c.dtype, rngs=rngs
        )
        if c.word_embed_proj_dim != c.hidden_size:
            self.project_in = nnx.Linear(c.word_embed_proj_dim, c.hidden_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
            self.project_out = nnx.Linear(c.hidden_size, c.word_embed_proj_dim, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        else:
            self.project_in = None
            self.project_out = None
        self.layers = nnx.List([OPTDecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.final_layer_norm = (
            nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs)
            if c.do_layer_norm_before
            else None
        )


class OPTModel(nnx.Module):
    def __init__(self, config: OPTConfig, rngs: nnx.Rngs):
        self.decoder = OPTDecoder(config, rngs)


class OPTForCausalLM(nnx.Module):
    """OPT with (optionally tied) LM head, HF-compatible module names."""

    def __init__(self, config: OPTConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = OPTModel(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.word_embed_proj_dim, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None, cache_pos=0):
        dec = self.model.decoder
        B, T = input_ids.shape
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)  # [1,1] or [B,1]
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        x = dec.embed_tokens(input_ids)
        if dec.project_in is not None:
            x = _maybe_deq(dec.project_in(x))
        x = x + dec.embed_positions(positions + _POS_OFFSET)
        if cache is None:
            mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min)[None, None]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, jnp.finfo(jnp.float32).min)
        new_cache = [] if cache is not None else None
        for i, layer in enumerate(dec.layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)
        if dec.final_layer_norm is not None:
            x = dec.final_layer_norm(x)
        if dec.project_out is not None:
            x = _maybe_deq(dec.project_out(x))
        if self.lm_head is None:
            from ..tensor.qarray import QArray

            emb = dec.embed_tokens.embedding.get_value()
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
                c.num_hidden_layers, batch, max_len,
                c.num_attention_heads, c.hidden_size // c.num_attention_heads, qt,
            )
        dtype = dtype or c.dtype
        shape = (batch, max_len, c.num_attention_heads, c.hidden_size // c.num_attention_heads)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(c.num_hidden_layers)
        )
