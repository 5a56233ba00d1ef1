"""GPT-2 causal LM in flax NNX.

HF GPT-2 stores its projection weights as `Conv1D` modules with `[in, out]`
weight layout (the transpose of `torch.nn.Linear`). We implement them as
`nnx.Linear` (so `quanto_tpu.quantize()` can swap them for QLinears — going
beyond the torch reference, which cannot quantize Conv1D at all) and tag them
with `_hf_conv1d` so the checkpoint loader skips the usual transpose.

Module attribute names follow the HF layout (`transformer.h.N.attn.c_attn`,
...) so include/exclude patterns transfer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache


__all__ = ["GPT2Config", "GPT2LMHeadModel"]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "GPT2Config":
        return cls(
            vocab_size=config.vocab_size,
            n_positions=config.n_positions,
            n_embd=config.n_embd,
            n_layer=config.n_layer,
            n_head=config.n_head,
            layer_norm_epsilon=config.layer_norm_epsilon,
            dtype=dtype,
        )


def _conv1d_linear(in_features, out_features, dtype, rngs):
    lin = nnx.Linear(in_features, out_features, use_bias=True, param_dtype=dtype, rngs=rngs)
    lin._hf_conv1d = True  # checkpoint loader: weight already [in, out]
    return lin


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class GPT2Attention(nnx.Module):
    def __init__(self, config: GPT2Config, rngs: nnx.Rngs):
        c = config
        self.num_heads = c.n_head
        self.head_dim = c.n_embd // c.n_head
        self.c_attn = _conv1d_linear(c.n_embd, 3 * c.n_embd, c.dtype, rngs)
        self.c_proj = _conv1d_linear(c.n_embd, c.n_embd, c.dtype, rngs)

    def __call__(self, x, mask, layer_cache=None, cache_pos=None):
        B, T, C = x.shape
        qkv = _maybe_deq(self.c_attn(x))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.num_heads, self.head_dim)
        k = k.reshape(B, T, self.num_heads, self.head_dim)
        v = v.reshape(B, T, self.num_heads, self.head_dim)
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..ops.attention import try_flash_decode
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            if T == 1:
                out = try_flash_decode(q, new_cache, cache_pos, self.num_heads, self.head_dim)
                if out is not None:
                    return _maybe_deq(self.c_proj(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`):
        # quantized-cache scale factoring + opt-in bf16 softmax chain.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, self.head_dim ** -0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        return _maybe_deq(self.c_proj(out)), new_cache


class GPT2MLP(nnx.Module):
    def __init__(self, config: GPT2Config, rngs: nnx.Rngs):
        c = config
        self.c_fc = _conv1d_linear(c.n_embd, 4 * c.n_embd, c.dtype, rngs)
        self.c_proj = _conv1d_linear(4 * c.n_embd, c.n_embd, c.dtype, rngs)

    def __call__(self, x):
        h = _maybe_deq(self.c_fc(x))
        h = jax.nn.gelu(h, approximate=True)
        return _maybe_deq(self.c_proj(h))


class GPT2Block(nnx.Module):
    def __init__(self, config: GPT2Config, rngs: nnx.Rngs):
        c = config
        self.ln_1 = nnx.LayerNorm(c.n_embd, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)
        self.attn = GPT2Attention(c, rngs)
        self.ln_2 = nnx.LayerNorm(c.n_embd, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)
        self.mlp = GPT2MLP(c, rngs)

    def __call__(self, x, mask, layer_cache=None, cache_pos=None):
        h, new_cache = self.attn(self.ln_1(x), mask, layer_cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.ln_2(x))
        return x, new_cache


class GPT2Model(nnx.Module):
    def __init__(self, config: GPT2Config, rngs: nnx.Rngs):
        c = config
        self.wte = nnx.Embed(c.vocab_size, c.n_embd, param_dtype=c.dtype, rngs=rngs)
        self.wpe = nnx.Embed(c.n_positions, c.n_embd, param_dtype=c.dtype, rngs=rngs)
        self.h = nnx.List([GPT2Block(c, rngs) for _ in range(c.n_layer)])
        self.ln_f = nnx.LayerNorm(c.n_embd, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)


class GPT2LMHeadModel(nnx.Module):
    """GPT-2 with tied LM head, HF-compatible module names (`transformer.*`)."""

    def __init__(self, config: GPT2Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.transformer = GPT2Model(config, rngs)

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None, cache_pos=0):
        c = self.config
        B, T = input_ids.shape
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)  # [1,1] or [B,1]
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        x = self.transformer.wte(input_ids) + self.transformer.wpe(positions)
        if cache is None:
            mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min)[None, None]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, jnp.finfo(jnp.float32).min)
        new_cache = [] if cache is not None else None
        for i, block in enumerate(self.transformer.h):
            layer_cache = cache[i] if cache is not None else None
            x, lc = block(x, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)
        x = self.transformer.ln_f(x)
        emb = self.transformer.wte.embedding.get_value()
        logits = x @ emb.T.astype(x.dtype)
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        c = self.config
        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            return init_quantized_kv_cache(
                c.n_layer, batch, max_len, c.n_head, c.n_embd // c.n_head, qt
            )
        dtype = dtype or c.dtype
        shape = (batch, max_len, c.n_head, c.n_embd // c.n_head)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(c.n_layer)
        )
