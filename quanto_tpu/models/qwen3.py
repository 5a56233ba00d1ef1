"""Qwen3 (dense and MoE) causal LMs in flax NNX.

Qwen3 (HF `transformers/models/qwen3/modeling_qwen3.py`) is llama-layout
with two twists:

- **QK-norm**: per-head-dim RMSNorms `q_norm`/`k_norm` applied to the
  reshaped [B, T, H, D] projections BEFORE rope (modeling_qwen3.py:200-201)
  — no qkv bias (unlike qwen2).
- `head_dim` is an explicit config field (decoupled from hidden/heads),
  and sliding-window attention can be enabled for the tail layers
  (`layer_types`, sliding for `i >= max_window_layers`).

Qwen3-MoE (`modeling_qwen3_moe.py`) adds per-layer sparse MoE MLPs — the
qwen2-moe routing WITHOUT the shared expert, with `norm_topk_prob`
defaulting to True. Module names mirror HF so checkpoints, include/exclude
patterns, and the llama TP rules transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, LlamaMLP, RMSNorm, _apply_rope, _rope, freeze_rope_scaling


__all__ = ["Qwen3Config", "Qwen3ForCausalLM", "Qwen3MoeConfig", "Qwen3MoeForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 4096
    intermediate_size: int = 22016
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # HF rope_scaling (Qwen3 long-context checkpoints use yarn); same
    # hashable-tuple storage and rope_params semantics as the llama family.
    rope_scaling: Optional[tuple] = None
    sliding_window: Optional[int] = None
    layer_types: Optional[Tuple[str, ...]] = None
    tie_word_embeddings: bool = False
    hidden_act: str = "silu"
    # MLP plumbing shared with LlamaMLP.
    mlp_bias: bool = False
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_key_value_heads is None:
            object.__setattr__(self, "num_key_value_heads", self.num_attention_heads)
        if self.layer_types is None:
            object.__setattr__(
                self, "layer_types", ("full_attention",) * self.num_hidden_layers
            )

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16):
        get = lambda k, d=None: getattr(config, k, d)
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads"),
            head_dim=get("head_dim", 128),
            max_position_embeddings=get("max_position_embeddings", 32768),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(get("rope_scaling")),
            sliding_window=get("sliding_window"),
            layer_types=tuple(get("layer_types")) if get("layer_types") else None,
            tie_word_embeddings=get("tie_word_embeddings", False),
            hidden_act=get("hidden_act", "silu"),
            dtype=dtype,
        )


@dataclasses.dataclass(frozen=True)
class Qwen3MoeConfig(Qwen3Config):
    num_experts: int = 128
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    mlp_only_layers: Tuple[int, ...] = ()

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16):
        base = Qwen3Config.from_hf(config, dtype=dtype)
        kw = {f.name: getattr(base, f.name) for f in dataclasses.fields(Qwen3Config)}
        for name in (
            "num_experts", "num_experts_per_tok", "moe_intermediate_size",
            "norm_topk_prob", "decoder_sparse_step",
        ):
            if hasattr(config, name):
                kw[name] = getattr(config, name)
        kw["mlp_only_layers"] = tuple(getattr(config, "mlp_only_layers", ()) or ())
        return cls(**kw)

    def is_moe_layer(self, layer_idx: int) -> bool:
        return (
            layer_idx not in self.mlp_only_layers
            and self.num_experts > 0
            and (layer_idx + 1) % self.decoder_sparse_step == 0
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class Qwen3Attention(nnx.Module):
    def __init__(self, c: Qwen3Config, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.q_proj = lin(c.hidden_size, self.num_heads * self.head_dim)
        self.k_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.v_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.o_proj = lin(self.num_heads * self.head_dim, c.hidden_size)
        # Per-head-dim RMSNorms, applied before rope.
        self.q_norm = RMSNorm(self.head_dim, c.rms_norm_eps, c.dtype)
        self.k_norm = RMSNorm(self.head_dim, c.rms_norm_eps, c.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        B, T, _ = x.shape
        H, Hkv, D = self.num_heads, self.num_kv_heads, self.head_dim
        q = self.q_norm(_maybe_deq(self.q_proj(x)).reshape(B, T, H, D))
        k = self.k_norm(_maybe_deq(self.k_proj(x)).reshape(B, T, Hkv, D))
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


class Qwen3MoeSparseBlock(nnx.Module):
    """Qwen3-MoE routing: softmax → top-k → (normalize) — the qwen2-moe
    block without the shared expert (modeling_qwen3_moe.py:213-265)."""

    def __init__(self, c: Qwen3MoeConfig, rngs: nnx.Rngs):
        self.num_experts = c.num_experts
        self.top_k = c.num_experts_per_tok
        self.norm_topk_prob = c.norm_topk_prob
        self.gate = nnx.Linear(c.hidden_size, c.num_experts, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.experts = nnx.List(
            [LlamaMLP(c, rngs, intermediate_size=c.moe_intermediate_size) for _ in range(c.num_experts)]
        )

    def __call__(self, x):
        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        mask = jnp.sum(
            jax.nn.one_hot(top_i, self.num_experts, dtype=jnp.float32) * top_p[..., None],
            axis=-2,
        )
        out = jnp.zeros_like(x)
        for e, expert in enumerate(self.experts):
            out = out + (mask[..., e : e + 1] * expert(x).astype(jnp.float32)).astype(x.dtype)
        return out


class Qwen3DecoderLayer(nnx.Module):
    def __init__(self, c: Qwen3Config, layer_idx: int, rngs: nnx.Rngs):
        self.self_attn = Qwen3Attention(c, rngs)
        if isinstance(c, Qwen3MoeConfig) and c.is_moe_layer(layer_idx):
            self.mlp = Qwen3MoeSparseBlock(c, rngs)
        else:
            self.mlp = LlamaMLP(c, rngs)
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_attention_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        h, new_cache = self.self_attn(
            self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos,
            causal_ok=causal_ok,
        )
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class Qwen3Model(nnx.Module):
    def __init__(self, c: Qwen3Config, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([Qwen3DecoderLayer(c, i, rngs) for i in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class Qwen3ForCausalLM(nnx.Module):
    """Qwen3 with the `(logits, cache)` decode API shared by the other
    causal families. Also the base for Qwen3-MoE."""

    def __init__(self, config: Qwen3Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Qwen3Model(config, rngs)
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
        cos, sin = _rope(
            positions, c.head_dim, c.rope_theta, x.dtype,
            c.rope_scaling, c.max_position_embeddings,
        )

        neg = jnp.finfo(jnp.float32).min
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
        causal = k_pos <= q_pos
        full_mask = jnp.where(causal, 0.0, neg)
        sliding_mask = None
        if c.sliding_window is not None and "sliding_attention" in c.layer_types:
            sliding_mask = jnp.where(causal & (k_pos > q_pos - c.sliding_window), 0.0, neg)

        new_cache = [] if cache is not None else None
        from ..ops.attention import static_zero_pos

        causal0 = static_zero_pos(cache_pos)
        for i, layer in enumerate(self.model.layers):
            sliding = c.layer_types[i] == "sliding_attention"
            mask = sliding_mask if sliding else full_mask
            layer_cache = cache[i] if cache is not None else None
            # A sliding layer whose window covers the whole block is still
            # pure causal at offset 0.
            ok = causal0 and (not sliding or c.sliding_window >= T)
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos,
                          causal_ok=ok)
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


class Qwen3MoeForCausalLM(Qwen3ForCausalLM):
    """Qwen3-MoE: Qwen3 attention + sparse MoE MLPs (no shared expert)."""

    def __init__(self, config: Qwen3MoeConfig, rngs: Optional[nnx.Rngs] = None):
        super().__init__(config, rngs)
