"""Falcon causal LM in flax NNX.

Falcon (HF `transformers/models/falcon/modeling_falcon.py`) ships THREE
structural variants behind one config, all with a single fused
`query_key_value` projection whose layout differs per variant
(FalconAttention._split_heads):

- **new_decoder_architecture** (Falcon-40B/180B): qkv is grouped
  `[Hkv, q_per_group + 2, D]` — real GQA; two parallel layernorms
  (`ln_attn` for attention, `ln_mlp` for the MLP) unless
  `num_ln_in_parallel_attn == 1`.
- **multi_query** (Falcon-7B default): layout `[H + 2, D]` — one shared
  k and v head; parallel attention with a single `input_layernorm`.
- **neither** (falcon-rw, BLOOM-style): per-head interleaved `[H, 3, D]`,
  sequential residual with `post_attention_layernorm`, and ALiBi instead
  of rotary. Falcon's ALiBi is added to the RAW q·k product and then
  scaled by 1/sqrt(D) (modeling_falcon.py eager alibi branch) — the
  opposite order from BLOOM.

Parallel residual: `out = mlp(ln(x)) + attn(ln(x)) + x`. MLP is ungated
`dense_h_to_4h -> gelu -> dense_4h_to_h`; projections are bias-free by
default (`config.bias`). Module names mirror HF
(`transformer.h.N.self_attention.query_key_value`) so checkpoints and
include/exclude patterns transfer 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .bloom import alibi_slopes
from .llama import KVCache, _apply_rope, _rope


__all__ = ["FalconConfig", "FalconForCausalLM"]


@dataclasses.dataclass(frozen=True)
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_hidden_layers: int = 32
    num_attention_heads: int = 71
    num_kv_heads: Optional[int] = None
    layer_norm_epsilon: float = 1e-5
    alibi: bool = False
    new_decoder_architecture: bool = False
    multi_query: bool = True
    parallel_attn: bool = True
    num_ln_in_parallel_attn: Optional[int] = None
    bias: bool = False
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    ffn_hidden_size: Optional[int] = None
    activation: str = "gelu"
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_kv_heads is None:
            object.__setattr__(self, "num_kv_heads", self.num_attention_heads)
        if self.ffn_hidden_size is None:
            object.__setattr__(self, "ffn_hidden_size", 4 * self.hidden_size)
        if self.num_ln_in_parallel_attn is None and self.new_decoder_architecture:
            object.__setattr__(self, "num_ln_in_parallel_attn", 2)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def effective_kv_heads(self) -> int:
        """KV heads actually stored/attended (per _split_heads)."""
        if self.new_decoder_architecture:
            return self.num_kv_heads
        return 1 if self.multi_query else self.num_attention_heads

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "FalconConfig":
        get = lambda k, d=None: getattr(config, k, d)
        if get("rope_scaling") is not None:
            raise ValueError("Falcon rope scaling is not supported yet")
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_kv_heads=get("num_kv_heads"),
            layer_norm_epsilon=get("layer_norm_epsilon", 1e-5),
            alibi=get("alibi", False),
            new_decoder_architecture=get("new_decoder_architecture", False),
            multi_query=get("multi_query", True),
            parallel_attn=get("parallel_attn", True),
            num_ln_in_parallel_attn=get("num_ln_in_parallel_attn"),
            bias=get("bias", False),
            max_position_embeddings=get("max_position_embeddings", 2048),
            rope_theta=get("rope_theta", 10000.0),
            ffn_hidden_size=get("ffn_hidden_size"),
            activation=get("activation", "gelu"),
            tie_word_embeddings=get("tie_word_embeddings", True),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class FalconAttention(nnx.Module):
    def __init__(self, c: FalconConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.kv_heads = c.effective_kv_heads
        self.head_dim = c.head_dim
        self.new_arch = c.new_decoder_architecture
        self.multi_query = c.multi_query
        if c.new_decoder_architecture:
            qkv_out = (c.num_kv_heads * 2 + c.num_attention_heads) * self.head_dim
        elif c.multi_query:
            qkv_out = c.hidden_size + 2 * self.head_dim
        else:
            qkv_out = 3 * c.hidden_size
        self.query_key_value = nnx.Linear(c.hidden_size, qkv_out, use_bias=c.bias, param_dtype=c.dtype, rngs=rngs)
        self.dense = nnx.Linear(c.hidden_size, c.hidden_size, use_bias=c.bias, param_dtype=c.dtype, rngs=rngs)

    def _split_heads(self, fused):
        """q [B,T,H,D], k/v [B,T,Hkv,D] pre-broadcast (we keep the grouped
        form and use the GQA einsum instead of materializing)."""
        B, T, _ = fused.shape
        H, Hkv, D = self.num_heads, self.kv_heads, self.head_dim
        if self.new_arch:
            qkv = fused.reshape(B, T, Hkv, H // Hkv + 2, D)
            q = qkv[:, :, :, :-2].reshape(B, T, H, D)
            k = qkv[:, :, :, -2]
            v = qkv[:, :, :, -1]
            return q, k, v
        if self.multi_query:
            qkv = fused.reshape(B, T, H + 2, D)
            return qkv[:, :, :-2], qkv[:, :, -2:-1], qkv[:, :, -1:]
        qkv = fused.reshape(B, T, H, 3, D)
        return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    def __call__(self, x, cos, sin, alibi, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        B, T, _ = x.shape
        H, Hkv, D = self.num_heads, self.kv_heads, self.head_dim
        q, k, v = self._split_heads(_maybe_deq(self.query_key_value(x)))
        if cos is not None:
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            if causal_ok and alibi is None and T > 1:
                from ..ops.attention import try_flash_prefill

                out = try_flash_prefill(q, k, v, Hkv, D)
                if out is not None:
                    return _maybe_deq(self.dense(out)), new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        elif causal_ok and alibi is None and T > 1:
            from ..ops.attention import try_flash_prefill

            out = try_flash_prefill(q, k, v, Hkv, D)
            if out is not None:
                return _maybe_deq(self.dense(out)), None

        # Falcon order: (q·k + alibi) / sqrt(D), then mask — gqa_attention's
        # alibi slot applies exactly that ([B, H, S] alibi reshaped to the
        # grouped [B, Hkv, G, 1, S] layout inside).
        from ..ops.attention import gqa_attention

        q5 = q.reshape(B, T, Hkv, H // Hkv, D)
        out = gqa_attention(
            q5, k, v, mask, D**-0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift, alibi=alibi,
        )
        return _maybe_deq(self.dense(out)), new_cache


class FalconMLP(nnx.Module):
    def __init__(self, c: FalconConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(c.hidden_size, c.ffn_hidden_size, use_bias=c.bias, param_dtype=c.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(c.ffn_hidden_size, c.hidden_size, use_bias=c.bias, param_dtype=c.dtype, rngs=rngs)
        self._approx = c.activation in ("gelu_pytorch_tanh", "gelu_new", "gelu_fast")

    def __call__(self, x):
        h = jax.nn.gelu(_maybe_deq(self.dense_h_to_4h(x)), approximate=self._approx)
        return _maybe_deq(self.dense_4h_to_h(h))


class FalconDecoderLayer(nnx.Module):
    def __init__(self, c: FalconConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)
        self.self_attention = FalconAttention(c, rngs)
        self.mlp = FalconMLP(c, rngs)
        self._new_arch = c.new_decoder_architecture
        self._parallel = c.parallel_attn
        self._two_ln = c.new_decoder_architecture and c.num_ln_in_parallel_attn == 2
        if not c.parallel_attn:
            self.input_layernorm = ln()
            self.post_attention_layernorm = ln()
        elif self._two_ln:
            self.ln_attn = ln()
            self.ln_mlp = ln()
        else:
            self.input_layernorm = ln()

    def __call__(self, x, cos, sin, alibi, mask, layer_cache=None, cache_pos=None, causal_ok=False):
        residual = x
        if self._two_ln:
            attn_in = self.ln_attn(x)
            mlp_in = self.ln_mlp(x)
        else:
            attn_in = self.input_layernorm(x)
            mlp_in = attn_in  # parallel single-LN variants
        attn, new_cache = self.self_attention(attn_in, cos, sin, alibi, mask, layer_cache, cache_pos, causal_ok=causal_ok)
        if not self._new_arch and not self._parallel:
            residual = attn + residual
            mlp_in = self.post_attention_layernorm(residual)
        mlp_out = self.mlp(mlp_in)
        if self._new_arch or self._parallel:
            mlp_out = mlp_out + attn
        return mlp_out + residual, new_cache


class FalconModel(nnx.Module):
    def __init__(self, c: FalconConfig, rngs: nnx.Rngs):
        self.word_embeddings = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.h = nnx.List([FalconDecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.ln_f = nnx.LayerNorm(c.hidden_size, epsilon=c.layer_norm_epsilon, param_dtype=c.dtype, rngs=rngs)


class FalconForCausalLM(nnx.Module):
    """Falcon with the `(logits, cache)` decode API shared by the other
    causal families."""

    def __init__(self, config: FalconConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.transformer = FalconModel(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        cache: Optional[KVCache] = None,
        cache_pos=0,
        attention_mask: Optional[jnp.ndarray] = None,
    ):
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.transformer.word_embeddings(input_ids)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        neg = jnp.finfo(jnp.float32).min
        alibi = None
        cos = sin = None
        if c.alibi:
            slopes = alibi_slopes(c.num_attention_heads)
            if cache is None:
                if attention_mask is None:
                    attention_mask = jnp.ones((B, T), jnp.int32)
                k_idx = (jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask
                alibi = slopes[None, :, None] * k_idx[:, None, :].astype(jnp.float32)
            else:
                from ..tensor.kv_cache import cache_max_len

                max_len = cache_max_len(cache[0])
                k_pos = jnp.arange(max_len)
                alibi = jnp.broadcast_to(
                    slopes[None, :, None] * k_pos[None, None, :].astype(jnp.float32),
                    (B, c.num_attention_heads, max_len),
                )
        else:
            cos, sin = _rope(positions, c.head_dim, c.rope_theta, x.dtype)

        if cache is None:
            if attention_mask is None:
                keep = jnp.tril(jnp.ones((T, T), bool))[None, None]
            else:
                causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
                keep = causal & attention_mask[:, None, None, :].astype(bool)
            mask = jnp.where(keep, 0.0, neg)
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, neg)

        new_cache = [] if cache is not None else None
        from ..ops.attention import static_zero_pos

        causal_ok = static_zero_pos(cache_pos)
        for i, layer in enumerate(self.transformer.h):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, alibi, mask, layer_cache, cache_pos, causal_ok=causal_ok)
            if cache is not None:
                new_cache.append(lc)

        x = self.transformer.ln_f(x)
        if self.lm_head is None:
            emb = self.transformer.word_embeddings.embedding.get_value()
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
                c.num_hidden_layers, batch, max_len, c.effective_kv_heads, c.head_dim, qt
            )
        dtype = dtype or c.dtype
        shape = (batch, max_len, c.effective_kv_heads, c.head_dim)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(c.num_hidden_layers)
        )
