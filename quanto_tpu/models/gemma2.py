"""Gemma-2 causal LM in flax NNX.

Gemma-2 is a llama-shaped decoder with four distinctive mechanisms (HF
`transformers/models/gemma2/modeling_gemma2.py`):

- **Alternating attention**: even-indexed layers use sliding-window causal
  attention (`layer_types[i] == "sliding_attention"`, window includes the
  current token), odd layers are fully causal. We keep one full-length KV
  cache per layer and express the window purely through the mask — exact
  numerics, jit-static shapes.
- **Logit softcapping**: attention scores pass through
  `cap * tanh(scores / cap)` BEFORE the mask, and final LM logits through
  the same with `final_logit_softcapping`.
- **Query scaling** comes from `query_pre_attn_scalar ** -0.5`, not
  `head_dim ** -0.5`.
- **Four norms per layer**: `post_attention_layernorm` /
  `post_feedforward_layernorm` normalize the sublayer OUTPUT before the
  residual add (not the post-residual stream).

Shares RMSNorm (unit-offset), rope, KV-cache plumbing and the
`(logits, cache)` decode API with `quanto_tpu.models.llama`; module
attribute names mirror the HF layout so checkpoints, include/exclude
patterns and `LLAMA_TP_RULES` transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, RMSNorm, _apply_rope, _rope


__all__ = ["Gemma2Config", "Gemma2ForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_hidden_layers: int = 26
    num_attention_heads: int = 8
    num_key_value_heads: Optional[int] = None
    head_dim: int = 256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: Optional[float] = 50.0
    final_logit_softcapping: Optional[float] = 30.0
    sliding_window: int = 4096
    layer_types: Optional[Tuple[str, ...]] = None
    attention_bias: bool = False
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_key_value_heads is None:
            object.__setattr__(self, "num_key_value_heads", self.num_attention_heads)
        if self.layer_types is None:
            # HF default (configuration_gemma2.py): even layers sliding.
            object.__setattr__(
                self,
                "layer_types",
                tuple(
                    "sliding_attention" if (i + 1) % 2 else "full_attention"
                    for i in range(self.num_hidden_layers)
                ),
            )

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Gemma2Config":
        get = lambda k, d=None: getattr(config, k, d)
        if get("rope_scaling") is not None:
            raise ValueError("Gemma-2 rope_scaling is not supported")
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads"),
            head_dim=get("head_dim", 256),
            max_position_embeddings=get("max_position_embeddings", 8192),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            query_pre_attn_scalar=get("query_pre_attn_scalar", 256.0),
            attn_logit_softcapping=get("attn_logit_softcapping", 50.0),
            final_logit_softcapping=get("final_logit_softcapping", 30.0),
            sliding_window=get("sliding_window", 4096),
            layer_types=tuple(get("layer_types")) if get("layer_types") else None,
            attention_bias=get("attention_bias", False),
            tie_word_embeddings=get("tie_word_embeddings", True),
            dtype=dtype,
        )


def _softcap(x, cap):
    return jnp.tanh(x / cap) * cap if cap is not None else x


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class Gemma2Attention(nnx.Module):
    def __init__(self, c: Gemma2Config, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.scaling = c.query_pre_attn_scalar**-0.5
        self.softcap = c.attn_logit_softcapping
        lin = lambda i, o: nnx.Linear(i, o, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs)
        self.q_proj = lin(c.hidden_size, self.num_heads * self.head_dim)
        self.k_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.v_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.o_proj = lin(self.num_heads * self.head_dim, c.hidden_size)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False,
                 ring=False, write_valid=None):
        B, T, _ = x.shape
        q = _maybe_deq(self.q_proj(x)).reshape(B, T, self.num_heads, self.head_dim)
        k = _maybe_deq(self.k_proj(x)).reshape(B, T, self.num_kv_heads, self.head_dim)
        v = _maybe_deq(self.v_proj(x)).reshape(B, T, self.num_kv_heads, self.head_dim)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None and ring:
            # W-slot ring cache on a sliding layer (models/sliding.py):
            # read-concat-write; the caller's mask covers [W + T] keys.
            from .sliding import ring_attention_inputs

            k, v, k_scale, v_scale, k_shift, v_shift, new_cache = (
                ring_attention_inputs(
                    layer_cache, k, v, cache_pos, write_valid, q.dtype, B
                )
            )
        elif layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            if causal_ok and T > 1:
                from ..ops.attention import try_flash_prefill

                out = try_flash_prefill(
                    q, k, v, self.num_kv_heads, self.head_dim,
                    softcap=self.softcap, scale=self.scaling,
                )
                if out is not None:
                    return _maybe_deq(self.o_proj(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        elif causal_ok and T > 1:
            from ..ops.attention import try_flash_prefill

            out = try_flash_prefill(
                q, k, v, self.num_kv_heads, self.head_dim,
                softcap=self.softcap, scale=self.scaling,
            )
            if out is not None:
                return _maybe_deq(self.o_proj(out)), None

        # Grouped-query 5D einsum (no KV materialization), as in llama.py.
        # HF order: scale -> softcap -> mask (modeling_gemma2.py
        # eager_attention_forward) — gqa_attention applies that order.
        from ..ops.attention import gqa_attention

        groups = self.num_heads // self.num_kv_heads
        q5 = q.reshape(B, T, self.num_kv_heads, groups, self.head_dim)
        out = gqa_attention(
            q5, k, v, mask, self.scaling,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift, softcap=self.softcap,
        )
        return _maybe_deq(self.o_proj(out)), new_cache


class Gemma2MLP(nnx.Module):
    def __init__(self, c: Gemma2Config, rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.gate_proj = lin(c.hidden_size, c.intermediate_size)
        self.up_proj = lin(c.hidden_size, c.intermediate_size)
        self.down_proj = lin(c.intermediate_size, c.hidden_size)

    def __call__(self, x):
        g = _maybe_deq(self.gate_proj(x))
        u = _maybe_deq(self.up_proj(x))
        # hidden_activation = gelu_pytorch_tanh
        return _maybe_deq(self.down_proj(jax.nn.gelu(g, approximate=True) * u))


class Gemma2DecoderLayer(nnx.Module):
    def __init__(self, c: Gemma2Config, rngs: nnx.Rngs):
        norm = lambda: RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, unit_offset=True)
        self.self_attn = Gemma2Attention(c, rngs)
        self.mlp = Gemma2MLP(c, rngs)
        self.input_layernorm = norm()
        self.post_attention_layernorm = norm()
        self.pre_feedforward_layernorm = norm()
        self.post_feedforward_layernorm = norm()

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False,
                 ring=False, write_valid=None):
        h, new_cache = self.self_attn(
            self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos,
            causal_ok=causal_ok, ring=ring, write_valid=write_valid,
        )
        x = x + self.post_attention_layernorm(h)
        x = x + self.post_feedforward_layernorm(self.mlp(self.pre_feedforward_layernorm(x)))
        return x, new_cache


class Gemma2Model(nnx.Module):
    def __init__(self, c: Gemma2Config, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([Gemma2DecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, unit_offset=True)


class Gemma2ForCausalLM(nnx.Module):
    """Gemma-2 with tied LM head and the `(logits, cache)` decode API shared
    by the other causal families."""

    def __init__(self, config: Gemma2Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Gemma2Model(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def _masks(self, B, T, cache, cache_pos, ring=False):
        """(full_mask, sliding_mask), each [B or 1, 1, T, S] (S = W + T for
        ring-layout sliding layers)."""
        neg = jnp.finfo(jnp.float32).min
        w = self.config.sliding_window
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            # Size the full mask from a FULL layer (ring sliding layers
            # hold only W slots).
            lt = self.config.layer_types
            fi = next((i for i, t in enumerate(lt) if t != "sliding_attention"), 0)
            max_len = cache_max_len(cache[fi])
            pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
            positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
        causal = k_pos <= q_pos
        full = jnp.where(causal, 0.0, neg)
        if ring:
            from .sliding import ring_mask

            sliding = ring_mask(positions, q_pos, cache_pos, w, B, neg)
        else:
            # Window includes the current token: attend iff q-w < k <= q
            # (transformers masking_utils sliding_window_overlay).
            sliding = jnp.where(causal & (k_pos > q_pos - w), 0.0, neg)
        return full, sliding

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None,
                 cache_pos=0, write_len=None, logits_indices=None):
        from ..tensor.qarray import QArray
        from .sliding import use_ring, write_valid_mask

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        # Gemma normalizer is rounded to the activation dtype (HF casts the
        # sqrt to hidden_states.dtype before multiplying).
        x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        cos, sin = _rope(positions, c.head_dim, c.rope_theta, x.dtype)
        ring = use_ring(c, cache)
        write_valid = write_valid_mask(write_len, T) if ring else None
        full_mask, sliding_mask = self._masks(B, T, cache, cache_pos, ring=ring)

        new_cache = [] if cache is not None else None
        from ..ops.attention import static_zero_pos

        causal0 = static_zero_pos(cache_pos)
        for i, layer in enumerate(self.model.layers):
            sliding = c.layer_types[i] == "sliding_attention"
            mask = sliding_mask if sliding else full_mask
            layer_cache = cache[i] if cache is not None else None
            lring = ring and sliding
            # Flash prefill reads post-write cache state; ring layers use
            # the concat path instead.
            ok = causal0 and (not sliding or c.sliding_window >= T) and not lring
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos,
                          causal_ok=ok, ring=lring, write_valid=write_valid)
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
            logits = _maybe_deq(self.lm_head(x))
        logits = _softcap(logits, c.final_logit_softcapping)
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None,
                      sliding_ring: bool = True):
        from .sliding import layer_cache_len

        c = self.config

        def ll(i):
            return layer_cache_len(c, i, max_len, bool(sliding_ring))

        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            return tuple(
                init_quantized_kv_cache(
                    1, batch, ll(i), c.num_key_value_heads, c.head_dim, qt
                )[0]
                for i in range(c.num_hidden_layers)
            )
        dtype = dtype or c.dtype
        return tuple(
            (
                jnp.zeros((batch, ll(i), c.num_key_value_heads, c.head_dim), dtype),
                jnp.zeros((batch, ll(i), c.num_key_value_heads, c.head_dim), dtype),
            ) for i in range(c.num_hidden_layers)
        )
