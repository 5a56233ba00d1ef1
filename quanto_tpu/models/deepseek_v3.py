"""DeepSeek-V3 causal LM (multi-head latent attention + sigmoid-routed MoE)
in flax NNX.

Reference behavior: HF `transformers/models/deepseek_v3/modeling_deepseek_v3.py`
(the torch quanto reference quantizes transformers modules in place; this is
our own TPU implementation of the same architecture). Key pieces:

- **MLA attention** (modeling_deepseek_v3.py:327-446): queries go through a
  low-rank bottleneck (`q_a_proj` -> RMSNorm -> `q_b_proj`) when
  `q_lora_rank` is set; keys/values are compressed to a `kv_lora_rank`-dim
  latent by `kv_a_proj_with_mqa`, which additionally emits a SHARED (single
  head, MQA-style) `qk_rope_head_dim` rotary key. Per-head keys/values are
  reconstructed by `kv_b_proj`; query/key heads carry
  `qk_nope_head_dim + qk_rope_head_dim` dims while values use `v_head_dim`.
- **TPU-native latent KV cache**: instead of materializing per-head K/V like
  the HF eager path (H * (192+128) dims/token), the cache stores only the
  post-norm latent + the shared roped key (`kv_lora_rank + qk_rope_head_dim`
  = 576 dims/token at V3 scale, a ~9x HBM saving) and decode uses the
  standard MLA weight-absorption identities:
      logits = (q_nope @ W_uk) @ latent^T + q_rope @ k_rope^T
      out    = (probs @ latent) @ W_uv
  which are exact rewrites of the expanded attention (einsum associativity).
- **MoE** (modeling_deepseek_v3.py:109-208): sigmoid router scores plus a
  learned `e_score_correction_bias` used for SELECTION only; group-limited
  routing (top-`topk_group` of `n_group` groups by sum of each group's top-2
  biased scores), top-k within the surviving groups, weights gathered from
  the UNBIASED sigmoid scores, optionally normalized, then scaled by
  `routed_scaling_factor`; plus always-on shared experts. The first
  `first_k_dense_replace` layers use a dense MLP.

Module names mirror HF so checkpoints, include/exclude patterns, and TP rules
transfer 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import LlamaMLP, RMSNorm, _apply_rope, _rope


__all__ = ["DeepseekV3Config", "DeepseekV3ForCausalLM"]


@dataclasses.dataclass(frozen=True)
class DeepseekV3Config:
    vocab_size: int = 129280
    hidden_size: int = 7168
    intermediate_size: int = 18432
    moe_intermediate_size: int = 2048
    num_hidden_layers: int = 61
    num_attention_heads: int = 128
    n_shared_experts: int = 1
    n_routed_experts: int = 256
    routed_scaling_factor: float = 2.5
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = 1536
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    qk_nope_head_dim: int = 128
    n_group: int = 8
    topk_group: int = 4
    num_experts_per_tok: int = 8
    first_k_dense_replace: int = 3
    norm_topk_prob: bool = True
    hidden_act: str = "silu"
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_interleave: bool = True
    # yarn mscale (rope_scaling["factor"], ["mscale_all_dim"]) folds into the
    # attention scaling exactly like modeling_deepseek_v3.py:371-377.
    rope_scaling_factor: Optional[float] = None
    rope_scaling_mscale_all_dim: float = 0.0
    attention_bias: bool = False
    tie_word_embeddings: bool = False
    mlp_bias: bool = False
    dtype: Any = jnp.float32

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def attention_scaling(self) -> float:
        s = self.qk_head_dim**-0.5
        if self.rope_scaling_factor is not None and self.rope_scaling_mscale_all_dim:
            f, m = self.rope_scaling_factor, self.rope_scaling_mscale_all_dim
            mscale = 1.0 if f <= 1 else 0.1 * m * math.log(f) + 1.0
            s = s * mscale * mscale
        return s

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16):
        get = lambda k, d=None: getattr(config, k, d)
        rs = get("rope_scaling") or {}
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            moe_intermediate_size=get("moe_intermediate_size", 2048),
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            n_shared_experts=get("n_shared_experts", 1),
            n_routed_experts=get("n_routed_experts", 256),
            routed_scaling_factor=get("routed_scaling_factor", 2.5),
            kv_lora_rank=get("kv_lora_rank", 512),
            q_lora_rank=get("q_lora_rank"),
            qk_rope_head_dim=get("qk_rope_head_dim", 64),
            v_head_dim=get("v_head_dim", 128),
            qk_nope_head_dim=get("qk_nope_head_dim", 128),
            n_group=get("n_group", 8),
            topk_group=get("topk_group", 4),
            num_experts_per_tok=get("num_experts_per_tok", 8),
            first_k_dense_replace=get("first_k_dense_replace", 3),
            norm_topk_prob=get("norm_topk_prob", True),
            hidden_act=get("hidden_act", "silu"),
            max_position_embeddings=get("max_position_embeddings", 4096),
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 10000.0),
            rope_interleave=get("rope_interleave", True),
            rope_scaling_factor=rs.get("factor"),
            rope_scaling_mscale_all_dim=rs.get("mscale_all_dim", 0.0) or 0.0,
            attention_bias=get("attention_bias", False),
            tie_word_embeddings=get("tie_word_embeddings", False),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _module_weight(m):
    """[out, in] float weight of an nnx.Linear or (frozen/unfrozen) QLinear."""
    if hasattr(m, "kernel"):
        return jnp.transpose(m.kernel.get_value())
    return _maybe_deq(m.weight.get_value())


def _apply_rope_interleave(x, cos, sin):
    """DeepSeek checkpoints store rotary pairs interleaved (even/odd dims);
    de-interleave to the half-rotation layout, then rotate
    (modeling_deepseek_v3.py:283-318)."""
    *lead, d = x.shape
    x = x.reshape(*lead, d // 2, 2)
    x = jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)
    return _apply_rope(x, cos, sin)


class DeepseekV3TopkRouter(nnx.Module):
    """Sigmoid scores + selection bias + group-limited top-k
    (modeling_deepseek_v3.py:109-153)."""

    def __init__(self, c: DeepseekV3Config, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(init(rngs.params(), (c.n_routed_experts, c.hidden_size), jnp.float32))
        self.e_score_correction_bias = nnx.Param(jnp.zeros((c.n_routed_experts,), jnp.float32))
        self.top_k = c.num_experts_per_tok
        self.n_routed_experts = c.n_routed_experts
        self.n_group = c.n_group
        self.topk_group = c.topk_group
        self.norm_topk_prob = c.norm_topk_prob
        self.routed_scaling_factor = c.routed_scaling_factor

    def __call__(self, x):
        # x: [N, hidden] -> (topk_indices [N, k], topk_weights [N, k]).
        n, e, g = x.shape[0], self.n_routed_experts, self.n_group
        logits = x.astype(jnp.float32) @ self.weight.get_value().astype(jnp.float32).T
        scores = jax.nn.sigmoid(logits)
        biased = scores + self.e_score_correction_bias.get_value()[None, :]
        # Group scores: sum of each group's top-2 biased scores.
        grouped = biased.reshape(n, g, e // g)
        top2, _ = jax.lax.top_k(grouped, 2)
        group_scores = jnp.sum(top2, axis=-1)
        _, group_idx = jax.lax.top_k(group_scores, self.topk_group)
        group_mask = jnp.sum(jax.nn.one_hot(group_idx, g, dtype=jnp.float32), axis=-2)
        score_mask = jnp.repeat(group_mask, e // g, axis=-1)
        masked = jnp.where(score_mask > 0, biased, 0.0)
        _, topk_idx = jax.lax.top_k(masked, self.top_k)
        # Weights come from the UNBIASED sigmoid scores.
        topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        if self.norm_topk_prob:
            topk_w = topk_w / (jnp.sum(topk_w, axis=-1, keepdims=True) + 1e-20)
        return topk_idx, topk_w * self.routed_scaling_factor


class DeepseekV3MoE(nnx.Module):
    """Routed experts (dense-mask combine) + always-on shared experts
    (modeling_deepseek_v3.py:156-208)."""

    def __init__(self, c: DeepseekV3Config, rngs: nnx.Rngs):
        self.experts = nnx.List(
            [LlamaMLP(c, rngs, intermediate_size=c.moe_intermediate_size) for _ in range(c.n_routed_experts)]
        )
        self.gate = DeepseekV3TopkRouter(c, rngs)
        self.shared_experts = LlamaMLP(
            c, rngs, intermediate_size=c.moe_intermediate_size * c.n_shared_experts
        )
        self.n_routed_experts = c.n_routed_experts

    def __call__(self, x):
        B, T, H = x.shape
        flat = x.reshape(-1, H)
        topk_idx, topk_w = self.gate(flat)
        mask = jnp.sum(
            jax.nn.one_hot(topk_idx, self.n_routed_experts, dtype=jnp.float32) * topk_w[..., None],
            axis=-2,
        )  # [N, E] combine weights
        out = jnp.zeros_like(flat, dtype=jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + mask[:, e : e + 1] * expert(flat).astype(jnp.float32)
        out = out.astype(x.dtype).reshape(B, T, H)
        return out + self.shared_experts(x)


class DeepseekV3Attention(nnx.Module):
    """Multi-head latent attention with a compressed-latent KV cache."""

    def __init__(self, c: DeepseekV3Config, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.qk_nope_head_dim = c.qk_nope_head_dim
        self.qk_rope_head_dim = c.qk_rope_head_dim
        self.v_head_dim = c.v_head_dim
        self.kv_lora_rank = c.kv_lora_rank
        self.q_lora_rank = c.q_lora_rank
        self.rope_interleave = c.rope_interleave
        self.scaling = c.attention_scaling
        qk_head_dim = c.qk_head_dim
        lin = lambda i, o, b=False: nnx.Linear(i, o, use_bias=b, param_dtype=c.dtype, rngs=rngs)
        if c.q_lora_rank is None:
            self.q_proj = lin(c.hidden_size, self.num_heads * qk_head_dim)
        else:
            self.q_a_proj = lin(c.hidden_size, c.q_lora_rank, c.attention_bias)
            self.q_a_layernorm = RMSNorm(c.q_lora_rank, c.rms_norm_eps, c.dtype)
            self.q_b_proj = lin(c.q_lora_rank, self.num_heads * qk_head_dim)
        self.kv_a_proj_with_mqa = lin(
            c.hidden_size, c.kv_lora_rank + c.qk_rope_head_dim, c.attention_bias
        )
        self.kv_a_layernorm = RMSNorm(c.kv_lora_rank, c.rms_norm_eps, c.dtype)
        self.kv_b_proj = lin(c.kv_lora_rank, self.num_heads * (c.qk_nope_head_dim + c.v_head_dim))
        self.o_proj = lin(self.num_heads * c.v_head_dim, c.hidden_size, c.attention_bias)

    def _queries(self, x, cos, sin):
        B, T, _ = x.shape
        H, Dn, Dr = self.num_heads, self.qk_nope_head_dim, self.qk_rope_head_dim
        if self.q_lora_rank is None:
            q = _maybe_deq(self.q_proj(x))
        else:
            q = _maybe_deq(self.q_b_proj(self.q_a_layernorm(_maybe_deq(self.q_a_proj(x)))))
        q = q.reshape(B, T, H, Dn + Dr)
        q_nope, q_rot = q[..., :Dn], q[..., Dn:]
        rope = _apply_rope_interleave if self.rope_interleave else _apply_rope
        return q_nope, rope(q_rot, cos, sin)

    def _latent(self, x, cos, sin):
        """Compressed KV: post-norm latent [B,T,L] + shared roped key [B,T,R]."""
        ckv = _maybe_deq(self.kv_a_proj_with_mqa(x))
        latent = self.kv_a_layernorm(ckv[..., : self.kv_lora_rank])
        k_rot = ckv[..., self.kv_lora_rank :][:, :, None, :]  # single MQA head
        rope = _apply_rope_interleave if self.rope_interleave else _apply_rope
        return latent, rope(k_rot, cos, sin)[:, :, 0, :]

    def _kv_b_weights(self):
        """Split kv_b_proj's [H*(Dn+Dv), L] weight into the per-head
        up-projections W_uk [H, Dn, L] and W_uv [H, Dv, L]."""
        H, Dn, Dv = self.num_heads, self.qk_nope_head_dim, self.v_head_dim
        w = _module_weight(self.kv_b_proj).reshape(H, Dn + Dv, self.kv_lora_rank)
        return w[:, :Dn, :], w[:, Dn:, :]

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        B, T, _ = x.shape
        H, Dn, Dv = self.num_heads, self.qk_nope_head_dim, self.v_head_dim
        q_nope, q_rot = self._queries(x, cos, sin)
        latent, k_rot = self._latent(x, cos, sin)

        if layer_cache is None:
            # Expanded (HF-eager-equivalent) form: reconstruct per-head K/V.
            kv = _maybe_deq(self.kv_b_proj(latent)).reshape(B, T, H, Dn + Dv)
            k_nope, v = kv[..., :Dn], kv[..., Dn:]
            logits = (
                jnp.einsum("bqhd,bkhd->bhqk", q_nope, k_nope, preferred_element_type=jnp.float32)
                + jnp.einsum("bqhd,bkd->bhqk", q_rot, k_rot, preferred_element_type=jnp.float32)
            ) * self.scaling + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * Dv)
            return _maybe_deq(self.o_proj(out)), None

        # Cached decode: weight-absorbed attention over the latent cache.
        from ..tensor.kv_cache import QKVCacheLayer, kv_read_raw, kv_update

        if isinstance(layer_cache, QKVCacheLayer):
            # Quantized latent cache: latent stored in the "k" slot, shared
            # rope key in the "v" slot, per-token scales factored out of the
            # contractions (same trick as kv_read_raw's contract for GQA).
            new_cache = kv_update(
                layer_cache, latent[:, :, None, :], k_rot[:, :, None, :], cache_pos
            )
            lat_raw, rot_raw, lat_s, rot_s, lat_m, _rot_m = kv_read_raw(new_cache, x.dtype, B)
            if lat_m is not None:
                raise NotImplementedError(
                    "asymmetric KV specs are not supported for the MLA "
                    "latent cache (use qint8/qint4/k8v4)"
                )
            c_cache, r_cache = lat_raw[:, :, 0, :], rot_raw[:, :, 0, :]
            s_lat, s_rot = lat_s[:, :, 0, 0], rot_s[:, :, 0, 0]  # [B, S]
        else:
            c_cache, r_cache = layer_cache
            pos = jnp.asarray(cache_pos, jnp.int32).reshape(())
            c_cache = jax.lax.dynamic_update_slice(c_cache, latent.astype(c_cache.dtype), (0, pos, 0))
            r_cache = jax.lax.dynamic_update_slice(r_cache, k_rot.astype(r_cache.dtype), (0, pos, 0))
            new_cache = (c_cache, r_cache)
            s_lat = s_rot = None
        w_uk, w_uv = self._kv_b_weights()
        # Absorb W_uk into the query: q_abs[b,q,h,l] = q_nope . W_uk[h,:,l].
        q_abs = jnp.einsum("bqhd,hdl->bqhl", q_nope, w_uk.astype(q_nope.dtype))
        l_nope = jnp.einsum("bqhl,bkl->bhqk", q_abs, c_cache.astype(q_abs.dtype), preferred_element_type=jnp.float32)
        l_rope = jnp.einsum("bqhd,bkd->bhqk", q_rot, r_cache.astype(q_rot.dtype), preferred_element_type=jnp.float32)
        if s_lat is not None:
            l_nope = l_nope * s_lat[:, None, None, :]
            l_rope = l_rope * s_rot[:, None, None, :]
        # bf16 softmax chain (ops/config.use_bf16_softmax, same opt-in knob
        # as gqa_attention): the [B, H, T, S] logits/probs intermediates run
        # at half HBM traffic; the normalizer accumulates f32 and the
        # division is DEFERRED past both latent contractions (divides the
        # [.., Dv] output instead of the [.., S] probabilities).
        from ..ops import config as _ops_config

        bf16_chain = x.dtype == jnp.bfloat16 and _ops_config.use_bf16_softmax()
        logits = (l_nope + l_rope) * self.scaling
        if bf16_chain:
            logits = logits.astype(jnp.bfloat16)
        logits = logits + mask.astype(logits.dtype)
        norm = None
        if bf16_chain:
            m = jnp.max(logits, axis=-1, keepdims=True)
            probs = jnp.exp(logits - m)
            norm = jnp.sum(probs, axis=-1, keepdims=True, dtype=jnp.float32)
            probs = probs.astype(x.dtype)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if s_lat is not None:
            probs_lat = (probs * s_lat[:, None, None, :].astype(probs.dtype))
        else:
            probs_lat = probs
        ctx = jnp.einsum("bhqk,bkl->bqhl", probs_lat, c_cache.astype(probs.dtype))
        out = jnp.einsum("bqhl,hdl->bqhd", ctx, w_uv.astype(ctx.dtype))
        if norm is not None:
            out = (out / jnp.transpose(norm, (0, 2, 1, 3))).astype(x.dtype)
        out = out.reshape(B, T, H * Dv)
        return _maybe_deq(self.o_proj(out)), new_cache


class DeepseekV3DecoderLayer(nnx.Module):
    def __init__(self, c: DeepseekV3Config, layer_idx: int, rngs: nnx.Rngs):
        self.self_attn = DeepseekV3Attention(c, rngs)
        if layer_idx >= c.first_k_dense_replace:
            self.mlp = DeepseekV3MoE(c, rngs)
        else:
            self.mlp = LlamaMLP(c, rngs)
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_attention_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def __call__(self, x, cos, sin, mask, layer_cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask, layer_cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class DeepseekV3Model(nnx.Module):
    def __init__(self, c: DeepseekV3Config, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([DeepseekV3DecoderLayer(c, i, rngs) for i in range(c.num_hidden_layers)])
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)


class DeepseekV3ForCausalLM(nnx.Module):
    """DeepSeek-V3 with the `(logits, cache)` decode API shared by the other
    causal families. The KV cache is the compressed MLA latent."""

    def __init__(self, config: DeepseekV3Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = DeepseekV3Model(config, rngs)
        if config.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(self, input_ids: jnp.ndarray, cache=None, cache_pos=0):
        from ..tensor.qarray import QArray

        c = self.config
        B, T = input_ids.shape
        x = self.model.embed_tokens(input_ids)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        cos, sin = _rope(positions, c.qk_rope_head_dim, c.rope_theta, x.dtype)

        neg = jnp.finfo(jnp.float32).min
        if cache is None:
            q_pos = jnp.arange(T)[None, None, :, None]
            k_pos = jnp.arange(T)[None, None, None, :]
        else:
            from ..tensor.kv_cache import cache_max_len

            max_len = cache_max_len(cache[0])
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
        mask = jnp.where(k_pos <= q_pos, 0.0, neg)

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
            logits = _maybe_deq(self.lm_head(x))
        return logits, (tuple(new_cache) if new_cache is not None else None)

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None) -> Tuple:
        """Per-layer (latent [B,S,kv_lora_rank], shared roped key [B,S,R]) —
        the MLA compressed cache (~(L+R)/(H*(Dqk+Dv)) of a per-head cache).
        With `kv_quant` the latent + rope key are stored int8/fp8 with
        per-token scales (another 2x on top of the ~9x MLA compression)."""
        c = self.config
        if kv_quant is not None:
            # Quantized latent cache: the compressed latent rides the "k"
            # payload, the shared rope key rides "v" (different trailing
            # dims are fine — QKVCacheLayer is shape-agnostic per slot).
            from ..tensor.kv_cache import QKVCacheLayer, device_zeros, parse_kv_spec
            from ..tensor.qtype import qtype as _qtype

            spec = kv_quant.name if isinstance(kv_quant, _qtype) else str(kv_quant)
            k_qt, v_qt, asym = parse_kv_spec(spec)
            if asym or k_qt is not v_qt:
                raise NotImplementedError(
                    "MLA latent cache supports plain symmetric specs only "
                    "(qint8/qint4/fp8) — the latent is not a per-head K/V"
                )
            qt = k_qt
            sdtype = jnp.int4 if (not qt.is_floating_point and qt.bits == 4) else qt.dtype
            return tuple(
                QKVCacheLayer(
                    _k_data=device_zeros((batch, max_len, 1, c.kv_lora_rank), sdtype),
                    _k_scale=jnp.ones((batch, max_len, 1, 1), jnp.float32),
                    _v_data=device_zeros((batch, max_len, 1, c.qk_rope_head_dim), sdtype),
                    _v_scale=jnp.ones((batch, max_len, 1, 1), jnp.float32),
                    qtype_name=qt.name,
                )
                for _ in range(c.num_hidden_layers)
            )
        dtype = dtype or c.dtype
        return tuple(
            (
                jnp.zeros((batch, max_len, c.kv_lora_rank), dtype),
                jnp.zeros((batch, max_len, c.qk_rope_head_dim), dtype),
            )
            for _ in range(c.num_hidden_layers)
        )
