"""Llama-family causal LM in flax NNX (covers Llama 2/3, Mistral, Qwen2-style
configs: RMSNorm + rotary + GQA + SwiGLU MLP).

The reference library does not implement models — it quantizes Hugging Face
torch modules in place (`optimum/quanto/models/transformers_models.py`). A
TPU-native framework needs its own forward implementations, so this module
provides the transformer itself, built from `nnx.Linear`/`nnx.Embed` so that
`quanto_tpu.quantize()` can swap the projections for `QLinear`s exactly like
the reference swaps `torch.nn.Linear`.

Module attribute names follow the Hugging Face llama layout
(`model.layers.N.self_attn.q_proj` etc.) so quantization maps, include/exclude
patterns and serialized state dicts transfer 1:1 from torch quanto models.

TPU notes: static shapes everywhere; decode uses a preallocated KV cache
updated with `lax.dynamic_update_slice` (jit/pjit friendly); attention is
einsum-based so XLA maps it onto the MXU; the KV cache can be stored
quantized (int8/fp8) via `kv_quant` for HBM savings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax


__all__ = ["LlamaConfig", "LlamaForCausalLM", "KVCache"]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # HF `rope_scaling` (llama3 / linear / dynamic / yarn), stored as a sorted
    # tuple of (key, value) pairs: the config lives in the nnx graphdef, which
    # is hashed as a jit cache key, so it must stay hashable.
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    # Qwen2-style: bias on q/k/v projections only (o_proj stays bias-free).
    qkv_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    # Gemma variants: RMSNorm computes x * (1 + w) and embeddings are scaled
    # by sqrt(hidden_size).
    rms_norm_unit_offset: bool = False
    scale_embeddings: bool = False
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_key_value_heads is None:
            object.__setattr__(self, "num_key_value_heads", self.num_attention_heads)
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.hidden_size // self.num_attention_heads)

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "LlamaConfig":
        """Build from a transformers PretrainedConfig (Llama/Mistral/Qwen2/Gemma)."""
        get = lambda k, d=None: getattr(config, k, d)
        is_gemma = get("model_type") in ("gemma", "gemma2")
        act = get("hidden_activation") or get("hidden_act") or "silu"
        return cls(
            hidden_act=act,
            rms_norm_unit_offset=is_gemma,
            scale_embeddings=is_gemma,
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=get("num_key_value_heads"),
            head_dim=get("head_dim"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=freeze_rope_scaling(get("rope_scaling")),
            tie_word_embeddings=get("tie_word_embeddings", False),
            attention_bias=get("attention_bias", False),
            # HF Qwen2 hardcodes qkv bias regardless of any (stray)
            # attention_bias key in config.json.
            qkv_bias=(
                True
                if get("model_type") in ("qwen2", "qwen2_moe")
                else get("attention_bias", False)
            ),
            mlp_bias=get("mlp_bias", False),
            dtype=dtype,
        )


class RMSNorm(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-6, dtype=jnp.float32, unit_offset: bool = False):
        # Gemma stores w with a unit offset: out = norm(x) * (1 + w), w init 0.
        self.weight = nnx.Param(jnp.zeros((dim,), dtype) if unit_offset else jnp.ones((dim,), dtype))
        self.eps = eps
        self.unit_offset = unit_offset

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        out = xf * lax.rsqrt(var + self.eps)
        w = self.weight.get_value().astype(jnp.float32)
        if self.unit_offset:
            w = 1.0 + w
        return (out * w).astype(x.dtype)


def _select_logit_rows(x: jnp.ndarray, logits_indices, B: int) -> jnp.ndarray:
    """Slice per-row hidden states at `logits_indices` (scalar or [B])
    BEFORE the lm_head — [B, T, H] -> [B, 1, H]; identity when None."""
    if logits_indices is None:
        return x
    idx = jnp.broadcast_to(
        jnp.asarray(logits_indices, jnp.int32).reshape(-1), (B,)
    )
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)


def freeze_rope_scaling(rs) -> Optional[Tuple[Tuple[str, Any], ...]]:
    """HF rope_scaling dict -> hashable sorted tuple (config-safe), or None."""
    if not rs:
        return None
    if isinstance(rs, tuple):
        return rs
    return tuple(
        sorted(
            (str(k), tuple(v) if isinstance(v, list) else v)
            for k, v in dict(rs).items()
        )
    )


def rope_params(
    head_dim: int,
    theta: float,
    scaling=None,
    max_position_embeddings: int = 0,
) -> Tuple[jnp.ndarray, float]:
    """Per-dim rotary inverse frequencies and the attention scale factor.

    Implements the HF `rope_scaling` variants (transformers
    `modeling_rope_utils.ROPE_INIT_FUNCTIONS`) used by released checkpoints:
    `llama3` (Llama-3.1+, the reference's headline bench model —
    `bench/generation/README.md`), `linear`, `dynamic` (NTK), and `yarn`.
    Everything is computed in numpy at trace time: the tables are static
    functions of the config, never data.

    `dynamic` note: HF recomputes frequencies per sequence length once it
    exceeds the original window; with static shapes we evaluate the NTK
    formula at `max_position_embeddings` (the full cache window), matching HF
    for sequences that use the extended window.
    """
    import math

    import numpy as np

    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    attn_scale = 1.0
    s = dict(scaling) if scaling else {}
    rope_type = s.get("rope_type", s.get("type", "default"))
    factor = float(s.get("factor", 1.0))
    if not s or rope_type == "default":
        pass
    elif rope_type == "linear":
        inv_freq = inv_freq / factor
    elif rope_type == "dynamic":
        # HF `_compute_dynamic_ntk_parameters` treats config
        # max_position_embeddings as the pretraining window and rescales the
        # base only when the RUNTIME sequence outgrows it; within the window
        # the frequencies are the defaults. Static shapes can't track runtime
        # length, so we match HF's within-window behavior exactly (identity)
        # unless the caller opts into a fixed evaluation length via a
        # "seq_len" entry in the scaling dict (our static extension: the NTK
        # formula evaluated once at that length).
        seq_len = int(s.get("seq_len", 0))
        orig = int(max_position_embeddings)
        if seq_len > orig > 0:
            base = theta * ((factor * seq_len / orig) - (factor - 1)) ** (
                head_dim / (head_dim - 2)
            )
            inv_freq = 1.0 / (
                base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
            )
    elif rope_type == "llama3":
        low_freq_factor = float(s["low_freq_factor"])
        high_freq_factor = float(s["high_freq_factor"])
        old_len = float(s["original_max_position_embeddings"])
        low_freq_wavelen = old_len / low_freq_factor
        high_freq_wavelen = old_len / high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
        smoothed = (1.0 - smooth) * scaled / factor + smooth * scaled
        is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
        inv_freq = np.where(is_medium, smoothed, scaled)
    elif rope_type == "yarn":
        orig = float(s.get("original_max_position_embeddings") or max_position_embeddings)
        beta_fast = float(s.get("beta_fast") or 32.0)
        beta_slow = float(s.get("beta_slow") or 1.0)

        def mscale(scale, m=1.0):
            return 0.1 * m * math.log(scale) + 1.0 if scale > 1.0 else 1.0

        attn = s.get("attention_factor")
        if attn is None:
            ms, ms_all = s.get("mscale"), s.get("mscale_all_dim")
            if ms and ms_all:
                attn = mscale(factor, ms) / mscale(factor, ms_all)
            else:
                attn = mscale(factor)
        attn_scale = float(attn)

        def correction_dim(n_rot):
            return head_dim * math.log(orig / (n_rot * 2 * math.pi)) / (2 * math.log(theta))

        low = correction_dim(beta_fast)
        high = correction_dim(beta_slow)
        if s.get("truncate", True):  # HF truthiness: None/0 also skip rounding
            low, high = math.floor(low), math.ceil(high)
        low = max(low, 0)
        high = min(high, head_dim - 1)
        if low == high:
            high = high + 0.001
        ramp = np.clip(
            (np.arange(head_dim // 2, dtype=np.float64) - low) / (high - low), 0.0, 1.0
        )
        extrap_factor = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1.0 - extrap_factor) + inv_freq * extrap_factor
    else:
        raise ValueError(f"unsupported rope_scaling type: {rope_type!r}")
    return jnp.asarray(inv_freq, jnp.float32), attn_scale


def _rope(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float,
    dtype,
    scaling=None,
    max_position_embeddings: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions, HF 'half-rotation' layout."""
    inv_freq, attn_scale = rope_params(head_dim, theta, scaling, max_position_embeddings)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, D/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return (jnp.cos(emb) * attn_scale).astype(dtype), (jnp.sin(emb) * attn_scale).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x, cos, sin):
    # x: [B, T, H, D]; cos/sin: [B, T, D] -> broadcast over heads.
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return x * cos + _rotate_half(x) * sin


# KV cache: (k, v) per layer, [B, max_len, n_kv_heads, head_dim], plus the
# current fill length (traced scalar). A plain pytree so it flows through
# jit / NamedSharding without special cases.
KVCache = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


def init_kv_cache(config: LlamaConfig, batch: int, max_len: int, dtype=None, kv_quant=None) -> KVCache:
    """Float KV cache, or quantized when `kv_quant` is a qtype/name
    (int8/fp8 cache — halves decode HBM traffic at long context)."""
    if kv_quant is not None:
        from ..tensor.kv_cache import init_quantized_kv_cache
        qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
        return init_quantized_kv_cache(
            config.num_hidden_layers, batch, max_len,
            config.num_key_value_heads, config.head_dim, qt,
        )
    dtype = dtype or config.dtype
    shape = (batch, max_len, config.num_key_value_heads, config.head_dim)
    return tuple(
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(config.num_hidden_layers)
    )


class LlamaAttention(nnx.Module):
    def __init__(self, config: LlamaConfig, rngs: nnx.Rngs):
        c = config
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        qkv_bias = c.attention_bias or c.qkv_bias
        self.q_proj = nnx.Linear(c.hidden_size, self.num_heads * self.head_dim, use_bias=qkv_bias, param_dtype=c.dtype, rngs=rngs)
        self.k_proj = nnx.Linear(c.hidden_size, self.num_kv_heads * self.head_dim, use_bias=qkv_bias, param_dtype=c.dtype, rngs=rngs)
        self.v_proj = nnx.Linear(c.hidden_size, self.num_kv_heads * self.head_dim, use_bias=qkv_bias, param_dtype=c.dtype, rngs=rngs)
        self.o_proj = nnx.Linear(self.num_heads * self.head_dim, c.hidden_size, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        from ..tensor.qarray import QArray

        B, T, _ = x.shape
        q = self.q_proj(x)
        k = self.k_proj(x)
        v = self.v_proj(x)
        q, k, v = (a.dequantize() if isinstance(a, QArray) else a for a in (q, k, v))
        q = q.reshape(B, T, self.num_heads, self.head_dim)
        k = k.reshape(B, T, self.num_kv_heads, self.head_dim)
        v = v.reshape(B, T, self.num_kv_heads, self.head_dim)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None:
            from ..ops.attention import static_zero_pos, try_flash_decode, try_flash_prefill
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            from ..parallel.context import active_sp

            sp = active_sp()
            if sp is not None:
                # Sequence-parallel serving (`sp_serving` active around this
                # trace): the cache is sharded along S over mesh[axis]; read
                # it with the distributed online softmax instead of a local
                # einsum chain. Decode (T=1) and chunked prefill both route
                # here — each query attends to global cache slots <= its
                # position.
                from ..parallel.context import cp_cached_attention

                mesh, axis = sp
                groups = self.num_heads // self.num_kv_heads
                q5 = q.reshape(B, T, self.num_kv_heads, groups, self.head_dim)
                pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
                q_pos = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
                out = cp_cached_attention(
                    q5, new_cache, q_pos, self.head_dim ** -0.5, mesh, axis
                )
                out = self.o_proj(out)
                if isinstance(out, QArray):
                    out = out.dequantize()
                return out, new_cache
            if T == 1:
                # Fused Pallas decode attention: one kernel reads the raw
                # cache payload + per-slot scales and writes [B, H, D] —
                # no HBM-round-tripping logits/probs intermediates.
                out = try_flash_decode(q, new_cache, cache_pos, self.num_kv_heads, self.head_dim)
                if out is not None:
                    out = self.o_proj(out)
                    if isinstance(out, QArray):
                        out = out.dequantize()
                    return out, new_cache
            elif static_zero_pos(cache_pos):
                # Causal-from-zero prefill: fused splash attention over the
                # RAW k/v just written (skips the [T, S] einsum chain and
                # the quantize->dequantize cache readback).
                out = try_flash_prefill(q, k, v, self.num_kv_heads, self.head_dim)
                if out is not None:
                    out = self.o_proj(out)
                    if isinstance(out, QArray):
                        out = out.dequantize()
                    return out, new_cache
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        elif T > 1:
            # Cache-less forward ([1,1,T,T] causal mask): same fused path.
            from ..ops.attention import try_flash_prefill

            out = try_flash_prefill(q, k, v, self.num_kv_heads, self.head_dim)
            if out is not None:
                out = self.o_proj(out)
                if isinstance(out, QArray):
                    out = out.dequantize()
                return out, None

        # Shared grouped-query 5D einsum attention (`ops/attention.gqa_attention`):
        # no repeated-KV materialization, per-slot cache scales factored out
        # of the contractions, optional bf16 softmax chain.
        from ..ops.attention import gqa_attention

        groups = self.num_heads // self.num_kv_heads
        q5 = q.reshape(B, T, self.num_kv_heads, groups, self.head_dim)
        out = gqa_attention(
            q5, k, v, mask, self.head_dim ** -0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        out = self.o_proj(out)
        if isinstance(out, QArray):
            out = out.dequantize()
        return out, new_cache


class LlamaMLP(nnx.Module):
    def __init__(self, config: LlamaConfig, rngs: nnx.Rngs, intermediate_size: Optional[int] = None):
        c = config
        inter = intermediate_size or c.intermediate_size
        self.gate_proj = nnx.Linear(c.hidden_size, inter, use_bias=c.mlp_bias, param_dtype=c.dtype, rngs=rngs)
        self.up_proj = nnx.Linear(c.hidden_size, inter, use_bias=c.mlp_bias, param_dtype=c.dtype, rngs=rngs)
        self.down_proj = nnx.Linear(inter, c.hidden_size, use_bias=c.mlp_bias, param_dtype=c.dtype, rngs=rngs)
        self.hidden_act = c.hidden_act

    def __call__(self, x):
        from ..tensor.qarray import QArray

        g = self.gate_proj(x)
        u = self.up_proj(x)
        g, u = (a.dequantize() if isinstance(a, QArray) else a for a in (g, u))
        act = jax.nn.silu(g) if self.hidden_act == "silu" else jax.nn.gelu(g, approximate=True)
        out = self.down_proj(act * u)
        return out.dequantize() if isinstance(out, QArray) else out


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, config: LlamaConfig, rngs: nnx.Rngs):
        self.self_attn = LlamaAttention(config, rngs)
        self.mlp = LlamaMLP(config, rngs)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype, config.rms_norm_unit_offset)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, config.dtype, config.rms_norm_unit_offset)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class LlamaModel(nnx.Module):
    def __init__(self, config: LlamaConfig, rngs: nnx.Rngs):
        c = config
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([LlamaDecoderLayer(c, rngs) for _ in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, c.rms_norm_unit_offset)


class LlamaForCausalLM(nnx.Module):
    """Causal LM head over LlamaModel, HF-compatible module names."""

    def __init__(self, config: LlamaConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = LlamaModel(config, rngs)
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
        logits_indices=None,
    ):
        """Forward pass.

        Without a cache: full causal self-attention over `input_ids` [B, T].
        With a cache: attends over `cache[:, :max_len]`; the current tokens
        are written at `cache_pos` (prefill with T>1 or decode with T=1).
        `cache_pos` may be a scalar (shared) or a [B] vector of per-slot
        positions (continuous batching). Returns (logits, new_cache or None).

        `logits_indices` (scalar or [B], optional): compute logits ONLY at
        these per-row positions (returned as [B, 1, V]) — the hidden states
        are sliced BEFORE the lm_head, so prefill skips O(T·V) logits
        memory and (T-1)/T of the head matmul (the serving engines pass
        each row's last real token; a 201k-vocab T=2048 prefill otherwise
        materializes a 1.6 GB f32 logits tensor).
        """
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        if c.scale_embeddings:
            x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)  # [1,1] or [B,1]
        positions = pos0 + jnp.arange(T)[None, :]
        positions = jnp.broadcast_to(positions, (B, T))
        cos, sin = _rope(
            positions, c.head_dim, c.rope_theta, x.dtype,
            c.rope_scaling, c.max_position_embeddings,
        )

        if cache is None:
            # [1, 1, T, T] causal mask.
            mask = jnp.where(
                jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
            )[None, None, :, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            # Query i (global pos cache_pos+i) attends to cache slots <= its
            # pos; [B, 1, T, S] when positions are per-slot.
            q_pos = positions[:, None, :, None]  # [B,1,T,1]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, jnp.finfo(jnp.float32).min)

        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.model.layers):
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos)
            if cache is not None:
                new_cache.append(lc)

        x = self.model.norm(x)
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

    # --- generation ------------------------------------------------------------

    def generate(
        self,
        input_ids: jnp.ndarray,
        max_new_tokens: int,
        *,
        cache_len: Optional[int] = None,
        cache_dtype=None,
    ) -> jnp.ndarray:
        """Greedy decode with a static-shape KV cache (eager convenience
        wrapper; the jitted serving path lives in `quanto_tpu.models.serve`)."""
        B, T = input_ids.shape
        total = T + max_new_tokens
        cache_len = cache_len or total
        cache = init_kv_cache(self.config, B, cache_len, cache_dtype)
        logits, cache = self(input_ids, cache, 0)
        next_tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        tokens = [input_ids, next_tok]
        pos = T
        for _ in range(max_new_tokens - 1):
            logits, cache = self(next_tok, cache, pos)
            next_tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            tokens.append(next_tok)
            pos += 1
        return jnp.concatenate(tokens, axis=1)
