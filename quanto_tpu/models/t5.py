"""T5 encoder-decoder (conditional generation) in flax NNX.

The torch reference quantizes arbitrary HF models, including the
encoder-decoder families its examples use (ASR/Whisper,
`examples/speech/speech_recognition/quantize_asr_model.py`; seq2seq via
`optimum-cli quanto quantize --task`); this module brings the
encoder-decoder architecture class to the TPU framework. Architecture
notes (HF `transformers/models/t5/modeling_t5.py` semantics):

- T5LayerNorm is RMSNorm (no mean subtraction, no bias) — reuse our
  `RMSNorm`.
- Attention has NO 1/sqrt(d) scaling (folded into init by the T5 authors).
- Relative position bias: bucketed relative positions embedded per head,
  owned by block 0's self-attention in each stack and shared by all blocks
  of that stack (bidirectional buckets in the encoder, causal in the
  decoder); cross-attention has no bias.
- Feed-forward is `wi/wo` (relu, original T5) or gated `wi_0/wi_1/wo`
  (v1.1, gelu_new == tanh-approximated gelu).
- Tied embeddings scale decoder output by d_model**-0.5 before the LM
  projection; v1.1 unties and uses a separate lm_head.

Module attribute names mirror the HF layout
(`encoder.block.N.layer.0.SelfAttention.q`, ...) so quantization maps,
include/exclude patterns and state dicts transfer 1:1.

TPU-native serving shape: `encode()` runs once; the decoder cache is a
pytree `(self_cache, cross_kv)` where the cross-attention K/V are computed
once from the encoder output and flow through decode steps unchanged —
`model(tok, cache, pos)` then has the same signature as the causal-LM
families, so `serve.make_decode_fn`'s jitted `lax.scan` decoder works
verbatim.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import RMSNorm


__all__ = ["T5Config", "T5ForConditionalGeneration"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: Optional[int] = None
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.num_decoder_layers is None:
            object.__setattr__(self, "num_decoder_layers", self.num_layers)

    @property
    def is_gated_act(self) -> bool:
        return self.feed_forward_proj.startswith("gated-")

    @property
    def dense_act_fn(self) -> str:
        # HF quirk: "gated-gelu" means gelu_new (tanh approximation), while a
        # plain "gelu" means exact (erf) gelu.
        if self.feed_forward_proj == "gated-gelu":
            return "gelu_new"
        return self.feed_forward_proj.split("-")[-1]

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "T5Config":
        return cls(
            vocab_size=config.vocab_size,
            d_model=config.d_model,
            d_kv=config.d_kv,
            d_ff=config.d_ff,
            num_layers=config.num_layers,
            num_decoder_layers=getattr(config, "num_decoder_layers", None),
            num_heads=config.num_heads,
            relative_attention_num_buckets=config.relative_attention_num_buckets,
            relative_attention_max_distance=getattr(
                config, "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=config.layer_norm_epsilon,
            feed_forward_proj=config.feed_forward_proj,
            tie_word_embeddings=getattr(config, "tie_word_embeddings", True),
            decoder_start_token_id=getattr(config, "decoder_start_token_id", 0),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


def _act(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unsupported T5 activation: {name}")


def _relative_position_bucket(
    relative_position, bidirectional: bool, num_buckets: int, max_distance: int
):
    """jnp translation of HF `T5Attention._relative_position_bucket`
    (relative_position = key_pos - query_pos, integer array)."""
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets = relative_buckets + (relative_position > 0) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(
            relative_position, jnp.zeros_like(relative_position)
        )
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    # log of 0/neg is guarded by the is_small select; clamp for finiteness.
    rp = jnp.maximum(relative_position, 1).astype(jnp.float32)
    val_if_large = max_exact + (
        jnp.log(rp / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(relative_position.dtype)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return relative_buckets + jnp.where(is_small, relative_position, val_if_large)


class T5Attention(nnx.Module):
    def __init__(self, config: T5Config, has_relative_bias: bool, rngs: nnx.Rngs):
        c = config
        self.num_heads = c.num_heads
        self.d_kv = c.d_kv
        inner = c.num_heads * c.d_kv
        mk = lambda i, o: nnx.Linear(i, o, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.q = mk(c.d_model, inner)
        self.k = mk(c.d_model, inner)
        self.v = mk(c.d_model, inner)
        self.o = mk(inner, c.d_model)
        self.relative_attention_bias = (
            nnx.Embed(c.relative_attention_num_buckets, c.num_heads, param_dtype=c.dtype, rngs=rngs)
            if has_relative_bias
            else None
        )

    def compute_bias(self, q_pos, k_pos, bidirectional: bool, num_buckets: int, max_distance: int):
        """[..., Q, K] int positions -> [..., H, Q, K] bias (block 0 only)."""
        rel = k_pos[..., None, :] - q_pos[..., :, None]
        bucket = _relative_position_bucket(rel, bidirectional, num_buckets, max_distance)
        bias = self.relative_attention_bias(bucket)  # [..., Q, K, H]
        return jnp.moveaxis(bias, -1, -3)  # [..., H, Q, K]

    def __call__(self, x, kv_source=None, mask=None, bias=None, layer_cache=None, cache_pos=None):
        """Self-attention when kv_source is None; cross-attention when
        kv_source holds precomputed (k, v) ([B, S, H, Dk])."""
        B, T, _ = x.shape
        H, Dk = self.num_heads, self.d_kv
        q = _maybe_deq(self.q(x)).reshape(B, T, H, Dk)
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if kv_source is not None:
            k, v = kv_source
        else:
            k = _maybe_deq(self.k(x)).reshape(B, T, H, Dk)
            v = _maybe_deq(self.v(x)).reshape(B, T, H, Dk)
            if layer_cache is not None:
                from ..tensor.kv_cache import kv_read_raw, kv_update

                new_cache = kv_update(layer_cache, k, v, cache_pos)
                k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`).
        # T5: NO 1/sqrt(d) scaling (scale=1.0); the relative position bias
        # is a per-head additive term -> `head_bias`.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, 1.0,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift, head_bias=bias,
        )
        return _maybe_deq(self.o(out)), new_cache


class T5LayerSelfAttention(nnx.Module):
    def __init__(self, config: T5Config, has_relative_bias: bool, rngs: nnx.Rngs):
        self.SelfAttention = T5Attention(config, has_relative_bias, rngs)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon, config.dtype)

    def __call__(self, x, mask=None, bias=None, layer_cache=None, cache_pos=None):
        h, new_cache = self.SelfAttention(
            self.layer_norm(x), mask=mask, bias=bias,
            layer_cache=layer_cache, cache_pos=cache_pos,
        )
        return x + h, new_cache


class T5LayerCrossAttention(nnx.Module):
    def __init__(self, config: T5Config, rngs: nnx.Rngs):
        self.EncDecAttention = T5Attention(config, False, rngs)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon, config.dtype)

    def cross_kv(self, enc_hidden):
        attn = self.EncDecAttention
        B, S, _ = enc_hidden.shape
        k = _maybe_deq(attn.k(enc_hidden)).reshape(B, S, attn.num_heads, attn.d_kv)
        v = _maybe_deq(attn.v(enc_hidden)).reshape(B, S, attn.num_heads, attn.d_kv)
        return k, v

    def __call__(self, x, kv, enc_mask=None):
        h, _ = self.EncDecAttention(self.layer_norm(x), kv_source=kv, mask=enc_mask)
        return x + h


class T5DenseActDense(nnx.Module):
    def __init__(self, config: T5Config, rngs: nnx.Rngs):
        c = config
        mk = lambda i, o: nnx.Linear(i, o, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.wi = mk(c.d_model, c.d_ff)
        self.wo = mk(c.d_ff, c.d_model)
        self.act = _act(c.dense_act_fn)

    def __call__(self, x):
        return _maybe_deq(self.wo(self.act(_maybe_deq(self.wi(x)))))


class T5DenseGatedActDense(nnx.Module):
    def __init__(self, config: T5Config, rngs: nnx.Rngs):
        c = config
        mk = lambda i, o: nnx.Linear(i, o, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        self.wi_0 = mk(c.d_model, c.d_ff)
        self.wi_1 = mk(c.d_model, c.d_ff)
        self.wo = mk(c.d_ff, c.d_model)
        self.act = _act(c.dense_act_fn)

    def __call__(self, x):
        h = self.act(_maybe_deq(self.wi_0(x))) * _maybe_deq(self.wi_1(x))
        return _maybe_deq(self.wo(h))


class T5LayerFF(nnx.Module):
    def __init__(self, config: T5Config, rngs: nnx.Rngs):
        self.DenseReluDense = (
            T5DenseGatedActDense(config, rngs)
            if config.is_gated_act
            else T5DenseActDense(config, rngs)
        )
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon, config.dtype)

    def __call__(self, x):
        return x + self.DenseReluDense(self.layer_norm(x))


class T5Block(nnx.Module):
    def __init__(self, config: T5Config, is_decoder: bool, has_relative_bias: bool, rngs: nnx.Rngs):
        mods = [T5LayerSelfAttention(config, has_relative_bias, rngs)]
        if is_decoder:
            mods.append(T5LayerCrossAttention(config, rngs))
        mods.append(T5LayerFF(config, rngs))
        self.layer = nnx.List(mods)


class T5Stack(nnx.Module):
    def __init__(self, config: T5Config, is_decoder: bool, rngs: nnx.Rngs):
        c = config
        n = c.num_decoder_layers if is_decoder else c.num_layers
        self.is_decoder = is_decoder
        self.block = nnx.List(
            [T5Block(c, is_decoder, has_relative_bias=(i == 0), rngs=rngs) for i in range(n)]
        )
        self.final_layer_norm = RMSNorm(c.d_model, c.layer_norm_epsilon, c.dtype)


class T5ForConditionalGeneration(nnx.Module):
    """T5 with HF-compatible module names and a causal-LM-shaped decode API."""

    def __init__(self, config: T5Config, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        c = config
        self.config = c
        self.shared = nnx.Embed(c.vocab_size, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.encoder = T5Stack(c, is_decoder=False, rngs=rngs)
        self.decoder = T5Stack(c, is_decoder=True, rngs=rngs)
        self.lm_head = (
            None
            if c.tie_word_embeddings
            else nnx.Linear(c.d_model, c.vocab_size, use_bias=False, param_dtype=c.dtype, rngs=rngs)
        )

    # --- encoder ---

    def encode(self, input_ids: jnp.ndarray, enc_mask: Optional[jnp.ndarray] = None):
        """input_ids [B, S] (+ optional bool mask [B, S]) -> hidden [B, S, D]."""
        c = self.config
        B, S = input_ids.shape
        x = self.shared(input_ids)
        pos = jnp.arange(S)
        bias = self.encoder.block[0].layer[0].SelfAttention.compute_bias(
            pos, pos, True, c.relative_attention_num_buckets, c.relative_attention_max_distance
        )[None]  # [1, H, S, S]
        mask = None
        if enc_mask is not None:
            mask = jnp.where(enc_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
        for block in self.encoder.block:
            x, _ = block.layer[0](x, mask=mask, bias=bias)
            x = block.layer[-1](x)
        return self.encoder.final_layer_norm(x)

    # --- decoder ---

    def _dec_bias(self, q_pos, k_pos):
        c = self.config
        return self.decoder.block[0].layer[0].SelfAttention.compute_bias(
            q_pos, k_pos, False, c.relative_attention_num_buckets, c.relative_attention_max_distance
        )

    def _lm_logits(self, x):
        from ..tensor.qarray import QArray

        # x is quantized when the final norm quantizes its output
        # (activations=... models); the projection below is a plain jnp
        # matmul, so dequantize first.
        x = _maybe_deq(x)
        if self.lm_head is None:
            emb = self.shared.embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            # Tied embeddings: HF rescales the decoder output.
            x = x * (self.config.d_model**-0.5)
            return x @ emb.T.astype(x.dtype)
        return _maybe_deq(self.lm_head(x))

    def init_decoder_cache(
        self, enc_hidden: jnp.ndarray, max_len: int,
        enc_mask: Optional[jnp.ndarray] = None, dtype=None, kv_quant=None,
    ):
        """Build the decode-time cache pytree: (self_cache, cross_kv, enc_bias)
        where cross_kv holds each decoder layer's precomputed encoder K/V.
        The result flows through `model(tok, cache, pos)` like a causal-LM
        cache (cross parts returned unchanged)."""
        c = self.config
        B = enc_hidden.shape[0]
        cross = tuple(
            block.layer[1].cross_kv(enc_hidden) for block in self.decoder.block
        )
        enc_bias = None
        if enc_mask is not None:
            enc_bias = jnp.where(enc_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            self_cache = init_quantized_kv_cache(
                c.num_decoder_layers, B, max_len, c.num_heads, c.d_kv, qt
            )
        else:
            shape = (B, max_len, c.num_heads, c.d_kv)
            dt = dtype or c.dtype
            self_cache = tuple(
                (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                for _ in range(c.num_decoder_layers)
            )
        return (self_cache, cross, enc_bias)

    def __call__(
        self,
        decoder_input_ids: jnp.ndarray,
        cache=None,
        cache_pos=0,
        encoder_input_ids: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
    ):
        """Cached mode (cache from `init_decoder_cache`): (logits, new_cache),
        the causal-LM decode signature. Full mode (cache=None): provide
        `encoder_input_ids` or `encoder_hidden_states`; returns
        (logits, None) over all decoder positions (the HF
        `model(input_ids, decoder_input_ids)` shape, used by parity tests)."""
        B, T = decoder_input_ids.shape
        x = self.shared(decoder_input_ids)

        if cache is None:
            if encoder_hidden_states is None:
                if encoder_input_ids is None:
                    raise ValueError("full forward needs encoder_input_ids or encoder_hidden_states")
                encoder_hidden_states = self.encode(encoder_input_ids, enc_mask)
            pos = jnp.arange(T)
            bias = self._dec_bias(pos, pos)[None]
            causal = jnp.where(
                jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
            )[None, None]
            enc_bias = None
            if enc_mask is not None:
                enc_bias = jnp.where(enc_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
            for block in self.decoder.block:
                x, _ = block.layer[0](x, mask=causal, bias=bias)
                x = block.layer[1](
                    x, block.layer[1].cross_kv(encoder_hidden_states), enc_mask=enc_bias
                )
                x = block.layer[-1](x)
            x = self.decoder.final_layer_norm(x)
            return self._lm_logits(x), None

        self_cache, cross, enc_bias = cache
        from ..tensor.kv_cache import cache_max_len

        max_len = cache_max_len(self_cache[0])
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)  # [1,1] or [B,1]
        q_pos = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        k_pos = jnp.arange(max_len)
        # Per-row bias [B, H, T, K] + causal visibility mask.
        bias = self._dec_bias(q_pos, jnp.broadcast_to(k_pos[None], (B, max_len)))
        mask = jnp.where(
            k_pos[None, None, None, :] <= q_pos[:, None, :, None],
            0.0,
            jnp.finfo(jnp.float32).min,
        )
        new_self = []
        for i, block in enumerate(self.decoder.block):
            x, lc = block.layer[0](
                x, mask=mask, bias=bias, layer_cache=self_cache[i], cache_pos=cache_pos
            )
            new_self.append(lc)
            x = block.layer[1](x, cross[i], enc_mask=enc_bias)
            x = block.layer[-1](x)
        x = self.decoder.final_layer_norm(x)
        return self._lm_logits(x), (tuple(new_self), cross, enc_bias)

    # --- convenience generation ---

    def generate(
        self,
        input_ids: jnp.ndarray,
        max_new_tokens: int,
        enc_mask: Optional[jnp.ndarray] = None,
        kv_quant=None,
    ) -> jnp.ndarray:
        """Greedy seq2seq generation; returns decoder ids [B, 1+max_new]
        starting with decoder_start_token_id."""
        c = self.config
        B = input_ids.shape[0]
        enc = self.encode(input_ids, enc_mask)
        cache = self.init_decoder_cache(
            enc, max_new_tokens + 1, enc_mask=enc_mask, kv_quant=kv_quant
        )
        tok = jnp.full((B, 1), c.decoder_start_token_id, input_ids.dtype)
        out = [tok]
        for t in range(max_new_tokens):
            logits, cache = self(tok, cache, t)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(tok.dtype)[:, None]
            out.append(tok)
        return jnp.concatenate(out, axis=1)
