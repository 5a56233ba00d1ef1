"""Mixtral (sparse mixture-of-experts llama) causal LM in flax NNX.

Adds the MoE model family: router (`block_sparse_moe.gate`) + per-expert
SwiGLU MLPs (`experts.E.w1/w2/w3`), attention/norms shared with the llama
implementation (same HF module names, so quantization maps and include/
exclude patterns transfer; the torch reference quantizes Mixtral through the
same generic module swap, `optimum/quanto/quantize.py:55-98`).

TPU notes: routing uses the dense-mask formulation — every expert computes
the full token batch and is combined with its (mostly-zero) routing weight.
This is jit-friendly (static shapes, no gather/scatter), keeps each expert an
ordinary `nnx.Linear` that `quantize()` can swap for a `QLinear`, and is the
standard small-E JAX approach. It spends E× FLOPs on MLPs vs capacity-based
dispatch — acceptable for decode (weight-bound) and small expert counts;
a capacity-dispatch shard_map path over an "ep" mesh axis is the scale-out
story (SURVEY.md §2.10 marks all parallelism as new capability).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import (
    KVCache,
    LlamaAttention,
    LlamaConfig,
    RMSNorm,
    _rope,
    init_kv_cache,
)


__all__ = ["MixtralConfig", "MixtralForCausalLM"]


@dataclasses.dataclass(frozen=True)
class MixtralConfig(LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "MixtralConfig":
        base = LlamaConfig.from_hf(config, dtype=dtype)
        kw = {f.name: getattr(base, f.name) for f in dataclasses.fields(LlamaConfig)}
        kw["num_local_experts"] = getattr(config, "num_local_experts", 8)
        kw["num_experts_per_tok"] = getattr(config, "num_experts_per_tok", 2)
        return cls(**kw)


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class MixtralExpert(nnx.Module):
    """One expert's SwiGLU MLP (HF names w1=gate, w2=down, w3=up)."""

    def __init__(self, config: MixtralConfig, rngs: nnx.Rngs):
        c = config
        self.w1 = nnx.Linear(c.hidden_size, c.intermediate_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.w2 = nnx.Linear(c.intermediate_size, c.hidden_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.w3 = nnx.Linear(c.hidden_size, c.intermediate_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        g = _maybe_deq(self.w1(x))
        u = _maybe_deq(self.w3(x))
        return _maybe_deq(self.w2(jax.nn.silu(g) * u))


class MixtralSparseMoeBlock(nnx.Module):
    def __init__(self, config: MixtralConfig, rngs: nnx.Rngs):
        c = config
        self.num_experts = c.num_local_experts
        self.top_k = c.num_experts_per_tok
        self.gate = nnx.Linear(c.hidden_size, c.num_local_experts, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.experts = nnx.List([MixtralExpert(c, rngs) for _ in range(c.num_local_experts)])

    def __call__(self, x):
        B, T, H = x.shape
        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)  # [B, T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)  # [B, T, K]
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        # Dense routing mask [B, T, E]: mostly zero, renormalized top-k probs.
        mask = jnp.sum(
            jax.nn.one_hot(top_i, self.num_experts, dtype=jnp.float32)
            * top_p[..., None],
            axis=-2,
        )
        out = jnp.zeros_like(x)
        for e, expert in enumerate(self.experts):
            out = out + (mask[..., e : e + 1] * expert(x).astype(jnp.float32)).astype(x.dtype)
        return out


class MixtralDecoderLayer(nnx.Module):
    def __init__(self, config: MixtralConfig, rngs: nnx.Rngs):
        self.self_attn = LlamaAttention(config, rngs)
        self.block_sparse_moe = MixtralSparseMoeBlock(config, rngs)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos)
        x = x + h
        x = x + self.block_sparse_moe(self.post_attention_layernorm(x))
        return x, new_cache


class MixtralModel(nnx.Module):
    def __init__(self, config: MixtralConfig, rngs: nnx.Rngs):
        c = config
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([MixtralDecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class MixtralForCausalLM(nnx.Module):
    """Mixtral causal LM, HF-compatible module names."""

    def __init__(self, config: MixtralConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = MixtralModel(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        return init_kv_cache(self.config, batch, max_len, dtype, kv_quant)

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None,
                 cache_pos=0, logits_indices=None):
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        cos, sin = _rope(
            positions, c.head_dim, c.rope_theta, x.dtype,
            c.rope_scaling, c.max_position_embeddings,
        )
        if cache is None:
            mask = jnp.where(
                jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
            )[None, None, :, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, jnp.finfo(jnp.float32).min)
        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.model.layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)
        x = self.model.norm(x)
        from .llama import _select_logit_rows

        x = _select_logit_rows(x, logits_indices, B)
        if self.lm_head is None:
            emb = self.model.embed_tokens.embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            logits = x @ emb.T.astype(x.dtype)
        else:
            logits = self.lm_head(x)
            if isinstance(logits, QArray):
                logits = logits.dequantize()
        return logits, (tuple(new_cache) if new_cache is not None else None)
