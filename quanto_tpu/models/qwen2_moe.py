"""Qwen2-MoE causal LM in flax NNX.

Qwen1.5/2-MoE (e.g. Qwen1.5-MoE-A2.7B): llama-family attention with
qkv-bias, per-layer sparse MoE MLPs with a SHARED expert gated by a sigmoid
(`mlp.shared_expert` + `mlp.shared_expert_gate`), optional dense layers via
`decoder_sparse_step` / `mlp_only_layers`, and optional top-k prob
normalization (`norm_topk_prob`, default False — unlike Mixtral which always
normalizes). HF module names (`model.layers.N.mlp.experts.E.gate_proj`, ...)
so quantization maps and checkpoints transfer 1:1; the torch reference
quantizes this family through the same generic module swap
(`optimum/quanto/quantize.py:55-98`).

Routing uses the same dense-mask formulation as `models/mixtral.py` (every
expert is an ordinary `nnx.Linear` the module swap can quantize).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import (
    KVCache,
    LlamaAttention,
    LlamaConfig,
    LlamaMLP,
    RMSNorm,
    _rope,
    init_kv_cache,
)


__all__ = ["Qwen2MoeConfig", "Qwen2MoeForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Qwen2MoeConfig(LlamaConfig):
    num_experts: int = 60
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 1408
    shared_expert_intermediate_size: int = 5632
    norm_topk_prob: bool = False
    decoder_sparse_step: int = 1
    mlp_only_layers: Tuple[int, ...] = ()

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Qwen2MoeConfig":
        base = LlamaConfig.from_hf(config, dtype=dtype)
        kw = {f.name: getattr(base, f.name) for f in dataclasses.fields(LlamaConfig)}
        for name in (
            "num_experts", "num_experts_per_tok", "moe_intermediate_size",
            "shared_expert_intermediate_size", "norm_topk_prob",
            "decoder_sparse_step",
        ):
            if hasattr(config, name):
                kw[name] = getattr(config, name)
        kw["mlp_only_layers"] = tuple(getattr(config, "mlp_only_layers", ()) or ())
        return cls(**kw)

    def is_moe_layer(self, layer_idx: int) -> bool:
        """HF rule (`modeling_qwen2_moe.py`): MoE unless listed in
        mlp_only_layers or skipped by decoder_sparse_step."""
        return (
            layer_idx not in self.mlp_only_layers
            and self.num_experts > 0
            and (layer_idx + 1) % self.decoder_sparse_step == 0
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class Qwen2MoeSparseBlock(nnx.Module):
    def __init__(self, config: Qwen2MoeConfig, rngs: nnx.Rngs):
        c = config
        self.num_experts = c.num_experts
        self.top_k = c.num_experts_per_tok
        self.norm_topk_prob = c.norm_topk_prob
        self.gate = nnx.Linear(c.hidden_size, c.num_experts, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.experts = nnx.List(
            [LlamaMLP(c, rngs, intermediate_size=c.moe_intermediate_size) for _ in range(c.num_experts)]
        )
        self.shared_expert = LlamaMLP(c, rngs, intermediate_size=c.shared_expert_intermediate_size)
        self.shared_expert_gate = nnx.Linear(c.hidden_size, 1, use_bias=False, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)  # [B, T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        mask = jnp.sum(
            jax.nn.one_hot(top_i, self.num_experts, dtype=jnp.float32)
            * top_p[..., None],
            axis=-2,
        )  # [B, T, E] dense routing weights
        out = jnp.zeros_like(x)
        for e, expert in enumerate(self.experts):
            out = out + (mask[..., e : e + 1] * expert(x).astype(jnp.float32)).astype(x.dtype)
        shared = self.shared_expert(x)
        shared_w = jax.nn.sigmoid(
            _maybe_deq(self.shared_expert_gate(x)).astype(jnp.float32)
        ).astype(x.dtype)
        return out + shared_w * shared


class Qwen2MoeDecoderLayer(nnx.Module):
    def __init__(self, config: Qwen2MoeConfig, layer_idx: int, rngs: nnx.Rngs):
        self.self_attn = LlamaAttention(config, rngs)
        if config.is_moe_layer(layer_idx):
            self.mlp = Qwen2MoeSparseBlock(config, rngs)
        else:
            self.mlp = LlamaMLP(config, rngs)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Qwen2MoeModel(nnx.Module):
    def __init__(self, config: Qwen2MoeConfig, rngs: nnx.Rngs):
        c = config
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List(
            [Qwen2MoeDecoderLayer(c, i, rngs) for i in range(c.num_hidden_layers)]
        )
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class Qwen2MoeForCausalLM(nnx.Module):
    """Qwen2-MoE causal LM, HF-compatible module names."""

    def __init__(self, config: Qwen2MoeConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Qwen2MoeModel(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        return init_kv_cache(self.config, batch, max_len, dtype, kv_quant)

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None, cache_pos=0):
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
