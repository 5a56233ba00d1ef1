"""Gemma-3 (text) causal LM in flax NNX.

Reference behavior: HF `transformers/models/gemma3/modeling_gemma3.py`
(Gemma3TextModel / Gemma3ForCausalLM). Deltas from Gemma-2 (gemma2.py here):

- **QK-norm** replaces logit softcapping: gemma-style (unit-offset) RMSNorms
  on the reshaped [B, T, H, D] query/key heads BEFORE rope
  (modeling_gemma3.py:292-313); `attn_logit_softcapping` and
  `final_logit_softcapping` default to None.
- **Dual rope**: sliding layers use `rope_local_base_freq` (default 10k) with
  plain rope; full-attention layers use `rope_theta` (default 1M) with an
  optional linear `rope_scaling` factor (positions / factor)
  (modeling_gemma3.py:472-480, 559-560).
- **5:1 sliding pattern**: `layer_types[i]` is sliding unless
  `(i + 1) % sliding_window_pattern == 0` (configuration_gemma3.py:238-242).

Everything else (embedding normalizer, 4-norm layer sandwich, gated
gelu_pytorch_tanh MLP, tied head) matches Gemma-2 and is reused from it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .gemma2 import Gemma2MLP, _maybe_deq
from .llama import KVCache, RMSNorm, _apply_rope, _rope


__all__ = ["Gemma3TextConfig", "Gemma3ForCausalLM"]


@dataclasses.dataclass(frozen=True)
class Gemma3TextConfig:
    vocab_size: int = 262208
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_hidden_layers: int = 26
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: int = 256
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_scaling_factor: Optional[float] = None  # linear scaling on global layers
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 4096
    sliding_window_pattern: int = 6
    layer_types: Optional[Tuple[str, ...]] = None
    attention_bias: bool = False
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.layer_types is None:
            object.__setattr__(
                self,
                "layer_types",
                tuple(
                    "sliding_attention" if (i + 1) % self.sliding_window_pattern else "full_attention"
                    for i in range(self.num_hidden_layers)
                ),
            )

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "Gemma3TextConfig":
        get = lambda k, d=None: getattr(config, k, d)
        rs = get("rope_scaling") or {}
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads", config.num_attention_heads),
            head_dim=get("head_dim", 256),
            max_position_embeddings=get("max_position_embeddings", 131072),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 1_000_000.0),
            rope_local_base_freq=get("rope_local_base_freq", 10_000.0),
            rope_scaling_factor=rs.get("factor") if rs.get("rope_type", rs.get("type")) == "linear" else None,
            query_pre_attn_scalar=get("query_pre_attn_scalar", 256.0),
            sliding_window=get("sliding_window", 4096),
            sliding_window_pattern=get("_sliding_window_pattern", get("sliding_window_pattern", 6)),
            layer_types=tuple(get("layer_types")) if get("layer_types") else None,
            attention_bias=get("attention_bias", False),
            tie_word_embeddings=get("tie_word_embeddings", True),
            dtype=dtype,
        )


class Gemma3Attention(nnx.Module):
    def __init__(self, c: Gemma3TextConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.scaling = c.query_pre_attn_scalar**-0.5
        lin = lambda i, o: nnx.Linear(i, o, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs)
        self.q_proj = lin(c.hidden_size, self.num_heads * self.head_dim)
        self.k_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.v_proj = lin(c.hidden_size, self.num_kv_heads * self.head_dim)
        self.o_proj = lin(self.num_heads * self.head_dim, c.hidden_size)
        self.q_norm = RMSNorm(c.head_dim, c.rms_norm_eps, c.dtype, unit_offset=True)
        self.k_norm = RMSNorm(c.head_dim, c.rms_norm_eps, c.dtype, unit_offset=True)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None, causal_ok=False,
                 ring=False, write_valid=None):
        B, T, _ = x.shape
        q = self.q_norm(_maybe_deq(self.q_proj(x)).reshape(B, T, self.num_heads, self.head_dim))
        k = self.k_norm(_maybe_deq(self.k_proj(x)).reshape(B, T, self.num_kv_heads, self.head_dim))
        v = _maybe_deq(self.v_proj(x)).reshape(B, T, self.num_kv_heads, self.head_dim)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None and ring:
            # W-slot ring cache on a sliding layer (models/sliding.py).
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
                    q, k, v, self.num_kv_heads, self.head_dim, scale=self.scaling,
                )
                if out is not None:
                    return _maybe_deq(self.o_proj(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        elif causal_ok and T > 1:
            from ..ops.attention import try_flash_prefill

            out = try_flash_prefill(
                q, k, v, self.num_kv_heads, self.head_dim, scale=self.scaling,
            )
            if out is not None:
                return _maybe_deq(self.o_proj(out)), None

        from ..ops.attention import gqa_attention

        groups = self.num_heads // self.num_kv_heads
        q5 = q.reshape(B, T, self.num_kv_heads, groups, self.head_dim)
        out = gqa_attention(
            q5, k, v, mask, self.scaling, k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        return _maybe_deq(self.o_proj(out)), new_cache


class Gemma3DecoderLayer(nnx.Module):
    def __init__(self, c: Gemma3TextConfig, rngs: nnx.Rngs):
        norm = lambda: RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, unit_offset=True)
        self.self_attn = Gemma3Attention(c, rngs)
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


class Gemma3Model(nnx.Module):
    def __init__(self, c: Gemma3TextConfig, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([Gemma3DecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, unit_offset=True)


class Gemma3ForCausalLM(nnx.Module):
    """Gemma-3 (text) with the `(logits, cache)` decode API shared by the
    other causal families."""

    def __init__(self, config: Gemma3TextConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = Gemma3Model(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def _masks(self, B, T, cache, cache_pos, ring=False):
        neg = jnp.finfo(jnp.float32).min
        w = self.config.sliding_window
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            # Full mask sized from a FULL layer (ring sliding layers hold
            # only W slots; gemma3's 5:1 pattern has full layers at
            # (i+1) % pattern == 0).
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
            sliding = jnp.where(causal & (k_pos > q_pos - w), 0.0, neg)
        return full, sliding

    def __call__(self, input_ids: jnp.ndarray, cache: Optional[KVCache] = None,
                 cache_pos=0, write_len=None, logits_indices=None):
        from ..tensor.qarray import QArray
        from .sliding import use_ring, write_valid_mask

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        # Global (full-attention) rope: rope_theta, with linear scaling
        # implemented as positions/factor (equivalent to inv_freq/factor).
        gpos = positions / c.rope_scaling_factor if c.rope_scaling_factor else positions
        cos_g, sin_g = _rope(gpos, c.head_dim, c.rope_theta, x.dtype)
        # Local (sliding) rope: rope_local_base_freq, never scaled.
        cos_l, sin_l = _rope(positions, c.head_dim, c.rope_local_base_freq, x.dtype)
        ring = use_ring(c, cache)
        write_valid = write_valid_mask(write_len, T) if ring else None
        full_mask, sliding_mask = self._masks(B, T, cache, cache_pos, ring=ring)

        new_cache = [] if cache is not None else None
        from ..ops.attention import static_zero_pos

        causal0 = static_zero_pos(cache_pos)
        for i, layer in enumerate(self.model.layers):
            sliding = c.layer_types[i] == "sliding_attention"
            mask = sliding_mask if sliding else full_mask
            cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
            layer_cache = cache[i] if cache is not None else None
            lring = ring and sliding
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
            )
            for i in range(c.num_hidden_layers)
        )
