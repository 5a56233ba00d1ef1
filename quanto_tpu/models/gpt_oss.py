"""GPT-OSS (OpenAI open-weight MoE, 2025) causal LM in flax NNX.

Reference behavior: HF `transformers/models/gpt_oss/modeling_gpt_oss.py`
(the torch quanto reference quantizes transformers modules generically; this
is our native implementation of the architecture). Distinctives:

- **Attention sinks**: a learned per-head logit joins the softmax as an
  extra valueless slot and is dropped after normalization
  (`eager_attention_forward`: concat -> softmax -> drop). Implemented as a
  denominator term in the shared `ops/attention.gqa_attention` chain
  (`sinks=` — no extra column materialized), composing with quantized KV
  caches and the bf16 softmax chain.
- **Alternating sliding/full attention** per `config.layer_types`
  (sliding window includes the current token), same mask-only scheme as
  gemma2: one cache layout, windows expressed purely through the additive
  mask.
- **MoE with FUSED expert parameters**: `experts.gate_up_proj`
  [E, H, 2I] (+ bias) with gate/up INTERLEAVED on the last dim
  (`[..., ::2]`/`[..., 1::2]`), `experts.down_proj` [E, I, H] (+ bias), and
  the clamped-SwiGLU variant
  `glu = clamp(gate, max=7) * sigmoid(1.702 * clamp(gate, max=7))`,
  `out = (clamp(up, +-7) + 1) * glu`. Router: top-k over biased linear
  logits, softmax over the SELECTED logits only.
- yarn rope with `truncate: False` (un-rounded correction range), biased
  q/k/v/o projections, untied lm_head.

Module names mirror HF (`model.layers.N.mlp.experts.gate_up_proj`, ...;
`self_attn.sinks`) so checkpoints and include/exclude patterns transfer.
The fused expert weights are plain Params (not nn.Linear) in HF too, so
the torch reference would also leave them unquantized by its module swap;
attention/lm_head quantize through the normal QLinear path here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, RMSNorm, _apply_rope, _rope


__all__ = ["GptOssConfig", "GptOssForCausalLM"]


@dataclasses.dataclass(frozen=True)
class GptOssConfig:
    vocab_size: int = 201088
    hidden_size: int = 2880
    intermediate_size: int = 2880
    num_hidden_layers: int = 24
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    head_dim: int = 64
    num_local_experts: int = 32
    num_experts_per_tok: int = 4
    sliding_window: int = 128
    layer_types: Optional[Tuple[str, ...]] = None
    rope_theta: float = 150000.0
    # Default mirrors the released checkpoints / HF GptOssConfig: yarn with
    # factor 32 and truncate=False (a hand-built config must match real
    # checkpoints; pass rope_scaling=None explicitly for unscaled rope).
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = (
        ("beta_fast", 32.0), ("beta_slow", 1.0), ("factor", 32.0),
        ("original_max_position_embeddings", 4096), ("rope_type", "yarn"),
        ("truncate", False),
    )
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-5
    attention_bias: bool = True
    tie_word_embeddings: bool = False
    swiglu_alpha: float = 1.702
    swiglu_limit: float = 7.0
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.layer_types is None:
            object.__setattr__(
                self,
                "layer_types",
                tuple(
                    "sliding_attention" if i % 2 == 0 else "full_attention"
                    for i in range(self.num_hidden_layers)
                ),
            )

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "GptOssConfig":
        get = lambda k, d=None: getattr(config, k, d)
        rs = get("rope_scaling")
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=config.num_key_value_heads,
            head_dim=get("head_dim", config.hidden_size // config.num_attention_heads),
            num_local_experts=get("num_local_experts", 32),
            num_experts_per_tok=get("num_experts_per_tok", 4),
            sliding_window=get("sliding_window", 128),
            layer_types=tuple(get("layer_types")) if get("layer_types") else None,
            rope_theta=get("rope_theta", 150000.0),
            rope_scaling=(
                tuple(sorted((k, v) for k, v in rs.items())) if rs else None
            ),
            max_position_embeddings=get("max_position_embeddings", 131072),
            rms_norm_eps=get("rms_norm_eps", 1e-5),
            attention_bias=get("attention_bias", True),
            tie_word_embeddings=get("tie_word_embeddings", False),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class GptOssAttention(nnx.Module):
    def __init__(self, c: GptOssConfig, layer_idx: int, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.sliding = c.layer_types[layer_idx] == "sliding_attention"
        lin = lambda i, o: nnx.Linear(
            i, o, use_bias=c.attention_bias, param_dtype=c.dtype, rngs=rngs
        )
        self.q_proj = lin(c.hidden_size, self.num_heads * c.head_dim)
        self.k_proj = lin(c.hidden_size, self.num_kv_heads * c.head_dim)
        self.v_proj = lin(c.hidden_size, self.num_kv_heads * c.head_dim)
        self.o_proj = lin(self.num_heads * c.head_dim, c.hidden_size)
        self.sinks = nnx.Param(jnp.zeros((self.num_heads,), c.dtype))

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None,
                 ring=False, write_valid=None):
        B, T, _ = x.shape
        H, Hkv, D = self.num_heads, self.num_kv_heads, self.head_dim
        G = H // Hkv
        q = _maybe_deq(self.q_proj(x)).reshape(B, T, H, D)
        k = _maybe_deq(self.k_proj(x)).reshape(B, T, Hkv, D)
        v = _maybe_deq(self.v_proj(x)).reshape(B, T, Hkv, D)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if layer_cache is not None and ring:
            # Sliding-window RING cache (W slots, not max_len): attend over
            # the PRE-write ring concatenated with the in-chunk K/V —
            # read-then-write is exact for any chunk length (kv_cache.py
            # ring notes) — then write the chunk at pos % W for the next
            # call. The caller's mask is built over [W + T] keys by
            # absolute position (`GptOssForCausalLM._masks`).
            from .sliding import ring_attention_inputs

            k, v, k_scale, v_scale, k_shift, v_shift, new_cache = (
                ring_attention_inputs(
                    layer_cache, k, v, cache_pos, write_valid, q.dtype, B
                )
            )
        elif layer_cache is not None:
            from ..tensor.kv_cache import kv_read_raw, kv_update

            new_cache = kv_update(layer_cache, k, v, cache_pos)
            k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(
                new_cache, q.dtype, B
            )
        # Shared GQA chain with the learned per-head sink logits (the flash
        # paths are outside the sink envelope, so this is always the einsum
        # chain — still the measured-fastest decode route on v5e).
        from ..ops.attention import gqa_attention

        q5 = q.reshape(B, T, Hkv, G, D)
        out = gqa_attention(
            q5, k, v, mask, D**-0.5,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
            sinks=self.sinks.get_value().astype(jnp.float32),
        )
        return _maybe_deq(self.o_proj(out)), new_cache


class GptOssExperts(nnx.Module):
    """Fused expert parameters in the HF layout (plain Params, not Linears:
    the torch reference's module swap leaves these unquantized too)."""

    def __init__(self, c: GptOssConfig, rngs: nnx.Rngs):
        init = nnx.initializers.normal(0.02)
        E, Hd, I = c.num_local_experts, c.hidden_size, c.intermediate_size
        self.gate_up_proj = nnx.Param(init(rngs.params(), (E, Hd, 2 * I), c.dtype))
        self.gate_up_proj_bias = nnx.Param(jnp.zeros((E, 2 * I), c.dtype))
        self.down_proj = nnx.Param(init(rngs.params(), (E, I, Hd), c.dtype))
        self.down_proj_bias = nnx.Param(jnp.zeros((E, Hd), c.dtype))
        self.alpha = c.swiglu_alpha
        self.limit = c.swiglu_limit

    def expert(self, x, e):
        """One expert's clamped-SwiGLU MLP on [N, H] tokens."""
        w_gu = self.gate_up_proj.get_value()[e]
        b_gu = self.gate_up_proj_bias.get_value()[e]
        gu = x @ w_gu.astype(x.dtype) + b_gu.astype(x.dtype)
        gate, up = gu[..., ::2], gu[..., 1::2]
        gate = jnp.minimum(gate, self.limit)
        up = jnp.clip(up, -self.limit, self.limit)
        glu = gate * jax.nn.sigmoid(gate * self.alpha)
        h = (up + 1.0) * glu
        w_d = self.down_proj.get_value()[e]
        b_d = self.down_proj_bias.get_value()[e]
        return h @ w_d.astype(x.dtype) + b_d.astype(x.dtype)


class GptOssTopKRouter(nnx.Module):
    def __init__(self, c: GptOssConfig, rngs: nnx.Rngs):
        init = nnx.initializers.normal(0.02)
        self.weight = nnx.Param(init(rngs.params(), (c.num_local_experts, c.hidden_size), c.dtype))
        self.bias = nnx.Param(jnp.zeros((c.num_local_experts,), c.dtype))
        self.top_k = c.num_experts_per_tok
        self.num_experts = c.num_local_experts

    def topk(self, flat):
        """[N, H] -> (top_i [N, K], top_p [N, K]): softmax over the SELECTED
        top-k logits (HF GptOssTopKRouter semantics)."""
        logits = (
            flat @ self.weight.get_value().T.astype(flat.dtype)
            + self.bias.get_value().astype(flat.dtype)
        ).astype(jnp.float32)
        top_v, top_i = jax.lax.top_k(logits, self.top_k)
        return top_i, jax.nn.softmax(top_v, axis=-1)

    def __call__(self, flat):
        # [N, H] -> dense scores [N, E] (zeros off the top-k), HF-shaped.
        top_i, top_p = self.topk(flat)
        scores = jnp.zeros((flat.shape[0], self.num_experts), jnp.float32).at[
            jnp.arange(flat.shape[0])[:, None], top_i
        ].set(top_p)
        return scores, top_i


class GptOssMLP(nnx.Module):
    def __init__(self, c: GptOssConfig, rngs: nnx.Rngs):
        self.router = GptOssTopKRouter(c, rngs)
        self.experts = GptOssExperts(c, rngs)
        self.num_experts = c.num_local_experts

    def __call__(self, x):
        B, T, Hd = x.shape
        flat = x.reshape(-1, Hd)
        scores, _ = self.router(flat)  # [N, E]
        out = jnp.zeros_like(flat, dtype=jnp.float32)
        for e in range(self.num_experts):
            y = self.experts.expert(flat, e)
            out = out + scores[:, e : e + 1] * y.astype(jnp.float32)
        return out.astype(x.dtype).reshape(B, T, Hd)


class GptOssDecoderLayer(nnx.Module):
    def __init__(self, c: GptOssConfig, layer_idx: int, rngs: nnx.Rngs):
        self.self_attn = GptOssAttention(c, layer_idx, rngs)
        self.mlp = GptOssMLP(c, rngs)
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_attention_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None,
                 ring=False, write_valid=None):
        h, new_cache = self.self_attn(
            self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos,
            ring=ring, write_valid=write_valid,
        )
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class GptOssModel(nnx.Module):
    def __init__(self, c: GptOssConfig, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List(
            [GptOssDecoderLayer(c, i, rngs) for i in range(c.num_hidden_layers)]
        )
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class GptOssForCausalLM(nnx.Module):
    """GPT-OSS with the `(logits, cache)` decode API shared by the other
    causal families (so serve.make_decode_fn / the engines work verbatim)."""

    def __init__(self, config: GptOssConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = GptOssModel(config, rngs)
        self.lm_head = nnx.Linear(
            config.hidden_size, config.vocab_size, use_bias=False,
            param_dtype=config.dtype, rngs=rngs,
        )

    def _ring_layers(self, cache) -> bool:
        from .sliding import use_ring

        return use_ring(self.config, cache)

    def _masks(self, B, T, cache, cache_pos, ring=False):
        neg = jnp.finfo(jnp.float32).min
        w = self.config.sliding_window
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            # Size the full mask from a FULL layer's capacity (under ring
            # mode the sliding layers' caches are only W slots).
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
        """`write_len` [B] (optional): number of REAL leading tokens per row
        in this chunk — fixed-shape engine chunks carry pad/garbage tail
        columns, which ring layers must NOT write (a ring write at
        (pos + t) % W aliases onto live window slots; the flat cache's
        "garbage lands at future positions" argument does not apply).
        Rows with write_len=0 write nothing."""
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
        ring = self._ring_layers(cache)
        write_valid = None
        if write_len is not None and ring:
            from .sliding import write_valid_mask

            write_valid = write_valid_mask(write_len, T)
        full_mask, sliding_mask = self._masks(B, T, cache, cache_pos, ring=ring)
        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.model.layers):
            sliding = c.layer_types[i] == "sliding_attention"
            mask = sliding_mask if sliding else full_mask
            layer_cache = cache[i] if cache is not None else None
            x, lc = layer(x, cos, sin, mask, layer_cache, cache_pos,
                          ring=ring and sliding, write_valid=write_valid)
            if cache is not None:
                new_cache.append(lc)
        x = self.model.norm(x)
        from .llama import _select_logit_rows

        x = _select_logit_rows(x, logits_indices, B)
        logits = self.lm_head(x)
        if isinstance(logits, QArray):
            logits = logits.dequantize()
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(
        self, batch: int, max_len: int, dtype=None, kv_quant=None,
        sliding_ring: bool = True,
    ) -> KVCache:
        """Per-layer cache; with `sliding_ring` (default) the sliding layers
        get W-slot RING buffers instead of max_len slots — their payload
        and attention reads drop by max_len/W (64x at ctx 8192 for the
        released window 128), exactly (kv_cache.py ring notes). Pass
        sliding_ring=False for uniform max_len layers."""
        from .sliding import layer_cache_len

        c = self.config

        def layer_len(i):
            return layer_cache_len(c, i, max_len, bool(sliding_ring))

        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache

            return tuple(
                init_quantized_kv_cache(
                    1, batch, layer_len(i),
                    c.num_key_value_heads, c.head_dim, kv_quant,
                )[0]
                for i in range(c.num_hidden_layers)
            )
        dtype = dtype or c.dtype
        return tuple(
            (
                jnp.zeros((batch, layer_len(i), c.num_key_value_heads, c.head_dim), dtype),
                jnp.zeros((batch, layer_len(i), c.num_key_value_heads, c.head_dim), dtype),
            )
            for i in range(c.num_hidden_layers)
        )
