"""BLOOM causal LM in flax NNX.

BLOOM is one of the four architectures the torch reference's SmoothQuant
recipe folds (`external/smoothquant/smoothquant.py:10` imports BloomBlock);
this module implements it natively. HF
`transformers/models/bloom/modeling_bloom.py` semantics:

- Embeddings: word embeddings followed by a dedicated LayerNorm
  (`word_embeddings_layernorm`); no positional embeddings at all —
  position information enters through ALiBi attention biases.
- ALiBi: per-head slopes (powers of 2^(-8/closest_pow2(H)), with the odd-head
  extension), multiplied by the key position index; added to the attention
  scores BEFORE the causal mask, with scores scaled by head_dim**-0.5.
- Attention projects q/k/v with ONE fused `query_key_value` Linear whose
  output interleaves per head as [H, 3, head_dim] (not three stacked blocks).
- Pre-norm residual layers, 4x MLP with tanh-approximated gelu, tied LM head.

Module attribute names mirror the HF layout
(`transformer.h.N.self_attention.query_key_value`, ...).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache


__all__ = ["BloomConfig", "BloomForCausalLM", "alibi_slopes"]


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 64
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    layer_norm_epsilon: float = 1e-5
    apply_residual_connection_post_layernorm: bool = False
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "BloomConfig":
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            num_hidden_layers=config.n_layer,
            num_attention_heads=config.n_head,
            layer_norm_epsilon=config.layer_norm_epsilon,
            apply_residual_connection_post_layernorm=getattr(
                config, "apply_residual_connection_post_layernorm", False
            ),
            tie_word_embeddings=getattr(config, "tie_word_embeddings", True),
            dtype=dtype,
        )


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes (HF `build_alibi_tensor`, modeling_bloom.py)."""
    cp2 = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** -(2.0 ** -(math.log2(cp2) - 3))
    slopes = [base ** i for i in range(1, cp2 + 1)]
    if cp2 != num_heads:
        extra_base = 2.0 ** -(2.0 ** -(math.log2(2 * cp2) - 3))
        slopes += [extra_base ** i for i in range(1, 2 * (num_heads - cp2), 2)]
    return jnp.asarray(slopes, jnp.float32)


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class BloomAttention(nnx.Module):
    def __init__(self, c: BloomConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.query_key_value = nnx.Linear(
            c.hidden_size, 3 * c.hidden_size, param_dtype=c.dtype, rngs=rngs
        )
        self.dense = nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x, alibi, mask, layer_cache=None, cache_pos=None):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        # Fused projection interleaved per head: [B, T, H, 3, D]
        # (HF BloomAttention._reshape).
        fused = _maybe_deq(self.query_key_value(x)).reshape(B, T, H, 3, D)
        q, k, v = fused[..., 0, :], fused[..., 1, :], fused[..., 2, :]
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`).
        # scores = alibi + qk/sqrt(d) (HF baddbmm beta=1, alpha=inv_norm):
        # ALiBi is added AFTER the scale factor, so it rides `head_bias`
        # (post-scale), not the falcon-style pre-scale `alibi` slot.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, D ** -0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift, head_bias=alibi,
        )
        return _maybe_deq(self.dense(out)), new_cache


class BloomMLP(nnx.Module):
    def __init__(self, c: BloomConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(c.hidden_size, 4 * c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(4 * c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        # BloomGelu is the tanh approximation.
        h = jax.nn.gelu(_maybe_deq(self.dense_h_to_4h(x)), approximate=True)
        return _maybe_deq(self.dense_4h_to_h(h))


class BloomBlock(nnx.Module):
    def __init__(self, c: BloomConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)
        self.input_layernorm = ln()
        self.self_attention = BloomAttention(c, rngs)
        self.post_attention_layernorm = ln()
        self.mlp = BloomMLP(c, rngs)
        self._post_ln_residual = c.apply_residual_connection_post_layernorm

    def __call__(self, x, alibi, mask, layer_cache=None, cache_pos=None):
        h = self.input_layernorm(x)
        residual = h if self._post_ln_residual else x
        attn, new_cache = self.self_attention(h, alibi, mask, layer_cache, cache_pos)
        x = attn + _maybe_deq(residual)
        h = self.post_attention_layernorm(x)
        residual = h if self._post_ln_residual else x
        return self.mlp(h) + _maybe_deq(residual), new_cache


class BloomTransformer(nnx.Module):
    def __init__(self, c: BloomConfig, rngs: nnx.Rngs):
        self.word_embeddings = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.word_embeddings_layernorm = nnx.LayerNorm(
            c.hidden_size, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs
        )
        self.h = nnx.List([BloomBlock(c, rngs) for _ in range(c.num_hidden_layers)])
        self.ln_f = nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)


class BloomForCausalLM(nnx.Module):
    """BLOOM with tied LM head, HF-compatible module names, and the same
    `(logits, cache)` decode API as the other causal families."""

    def __init__(self, config: BloomConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.transformer = BloomTransformer(config, rngs)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        cache: Optional[KVCache] = None,
        cache_pos=0,
        attention_mask: Optional[jnp.ndarray] = None,
    ):
        c = self.config
        tr = self.transformer
        B, T = input_ids.shape
        H = c.num_attention_heads
        slopes = alibi_slopes(H)
        x = tr.word_embeddings_layernorm(tr.word_embeddings(input_ids))
        neg = jnp.finfo(jnp.float32).min
        if cache is None:
            if attention_mask is None:
                attention_mask = jnp.ones((B, T), jnp.int32)
            # HF build_alibi_tensor: padding-relative position index.
            k_idx = (jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask
            alibi = slopes[None, :, None, None] * k_idx[:, None, None, :].astype(jnp.float32)
            causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
            keep = causal & attention_mask[:, None, None, :].astype(bool)
            mask = jnp.where(keep, 0.0, neg)
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
            q_pos = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
            k_pos = jnp.arange(max_len)
            # Absolute key positions; ALiBi is shift-invariant under softmax
            # so this matches the padding-relative form for dense prefixes.
            alibi = slopes[None, :, None, None] * k_pos[None, None, None, :].astype(jnp.float32)
            mask = jnp.where(
                k_pos[None, None, None, :] <= q_pos[:, None, :, None], 0.0, neg
            )
        new_cache = [] if cache is not None else None
        for i, block in enumerate(tr.h):
            layer_cache = cache[i] if cache is not None else None
            x, lc = block(x, alibi, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)
        x = tr.ln_f(x)
        from ..tensor.qarray import QArray

        emb = tr.word_embeddings.embedding.get_value()
        if isinstance(emb, QArray):
            emb = emb.dequantize()
        logits = x @ emb.T.astype(x.dtype)
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
