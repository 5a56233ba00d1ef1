"""Whisper speech-recognition encoder-decoder in flax NNX.

The torch reference's speech example quantizes Whisper
(`examples/speech/speech_recognition/quantize_asr_model.py`); this module
implements the architecture natively. HF
`transformers/models/whisper/modeling_whisper.py` semantics:

- Encoder frontend: two Conv1d layers over log-mel features (k=3, the second
  with stride 2), gelu after each, then FIXED sinusoidal positions (stored as
  a weight in the checkpoint — loaded, not recomputed) and pre-norm
  transformer layers.
- Decoder: learned positional embeddings (no offset), pre-norm layers with
  self-attention (causal) and cross-attention over the encoder output.
- Attention: standard multi-head with q scaled by head_dim**-0.5 applied
  right after q_proj (HF keeps this exact order for float parity); k_proj
  has NO bias, q/v/out do.
- proj_out is tied to the decoder embedding (no scale factor).

Module attribute names mirror the HF layout
(`model.encoder.layers.N.self_attn.q_proj`, ...). The decode cache is the
same (self_cache, cross_kv, None) pytree shape as T5's, so
`serve.make_decode_fn` and the quantized KV cache apply unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax


__all__ = ["WhisperConfig", "WhisperForConditionalGeneration"]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50257
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "WhisperConfig":
        return cls(
            vocab_size=config.vocab_size,
            num_mel_bins=config.num_mel_bins,
            d_model=config.d_model,
            encoder_layers=config.encoder_layers,
            encoder_attention_heads=config.encoder_attention_heads,
            encoder_ffn_dim=config.encoder_ffn_dim,
            decoder_layers=config.decoder_layers,
            decoder_attention_heads=config.decoder_attention_heads,
            decoder_ffn_dim=config.decoder_ffn_dim,
            max_source_positions=config.max_source_positions,
            max_target_positions=config.max_target_positions,
            decoder_start_token_id=getattr(config, "decoder_start_token_id", 50257),
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class WhisperConv1d(nnx.Module):
    """Conv1d storing the torch [out, in, k] weight layout so state-dict keys
    pass through the bare-param loader unchanged."""

    def __init__(self, in_ch: int, out_ch: int, k: int, stride: int, dtype, rngs: nnx.Rngs):
        scale = (in_ch * k) ** -0.5
        self.weight = nnx.Param(
            jax.random.uniform(rngs.params(), (out_ch, in_ch, k), dtype, -scale, scale)
        )
        self.bias = nnx.Param(jnp.zeros((out_ch,), dtype))
        self.stride = stride
        self.pad = (k - 1) // 2

    def __call__(self, x):  # x [B, T, C_in]
        w = jnp.transpose(self.weight.get_value(), (2, 1, 0))  # [K, I, O]
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride,), [(self.pad, self.pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + self.bias.get_value().astype(out.dtype)


class WhisperAttention(nnx.Module):
    def __init__(self, d_model: int, num_heads: int, dtype, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        mk = lambda bias: nnx.Linear(d_model, d_model, use_bias=bias, param_dtype=dtype, rngs=rngs)
        self.q_proj = mk(True)
        self.k_proj = mk(False)  # HF Whisper: k_proj has no bias
        self.v_proj = mk(True)
        self.out_proj = mk(True)

    def kv(self, source):
        B, S, _ = source.shape
        k = _maybe_deq(self.k_proj(source)).reshape(B, S, self.num_heads, self.head_dim)
        v = _maybe_deq(self.v_proj(source)).reshape(B, S, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, x, kv_source=None, mask=None, layer_cache=None, cache_pos=None):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        # HF order: scale q right after the projection (float parity).
        q = (_maybe_deq(self.q_proj(x)) * (D**-0.5)).reshape(B, T, H, D)
        new_cache = None
        k_scale = v_scale = k_shift = v_shift = None
        if kv_source is not None:
            k, v = kv_source
        else:
            k, v = self.kv(x)
            if layer_cache is not None:
                from ..tensor.kv_cache import kv_read_raw, kv_update

                new_cache = kv_update(layer_cache, k, v, cache_pos)
                k, v, k_scale, v_scale, k_shift, v_shift = kv_read_raw(new_cache, q.dtype, B)
        # Shared MHA-as-GQA(G=1) chain (`ops/attention.gqa_attention`);
        # q is pre-scaled above (HF parity), so scale=1.0 here.
        from ..ops.attention import gqa_attention

        out = gqa_attention(
            q[:, :, :, None, :], k, v, mask, 1.0,
            k_scale=k_scale, v_scale=v_scale,
            k_shift=k_shift, v_shift=v_shift,
        )
        return _maybe_deq(self.out_proj(out)), new_cache


class WhisperEncoderLayer(nnx.Module):
    def __init__(self, c: WhisperConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.d_model, epsilon=1e-5, param_dtype=c.dtype, rngs=rngs)
        self.self_attn = WhisperAttention(c.d_model, c.encoder_attention_heads, c.dtype, rngs)
        self.self_attn_layer_norm = ln()
        self.fc1 = nnx.Linear(c.d_model, c.encoder_ffn_dim, param_dtype=c.dtype, rngs=rngs)
        self.fc2 = nnx.Linear(c.encoder_ffn_dim, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.final_layer_norm = ln()

    def __call__(self, x):
        h, _ = self.self_attn(self.self_attn_layer_norm(x))
        x = x + h
        h = self.final_layer_norm(x)
        h = _maybe_deq(self.fc2(jax.nn.gelu(_maybe_deq(self.fc1(h)), approximate=False)))
        return x + h


class WhisperDecoderLayer(nnx.Module):
    def __init__(self, c: WhisperConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(c.d_model, epsilon=1e-5, param_dtype=c.dtype, rngs=rngs)
        self.self_attn = WhisperAttention(c.d_model, c.decoder_attention_heads, c.dtype, rngs)
        self.self_attn_layer_norm = ln()
        self.encoder_attn = WhisperAttention(c.d_model, c.decoder_attention_heads, c.dtype, rngs)
        self.encoder_attn_layer_norm = ln()
        self.fc1 = nnx.Linear(c.d_model, c.decoder_ffn_dim, param_dtype=c.dtype, rngs=rngs)
        self.fc2 = nnx.Linear(c.decoder_ffn_dim, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.final_layer_norm = ln()

    def __call__(self, x, cross_kv, mask=None, layer_cache=None, cache_pos=None):
        h, new_cache = self.self_attn(
            self.self_attn_layer_norm(x), mask=mask,
            layer_cache=layer_cache, cache_pos=cache_pos,
        )
        x = x + h
        h, _ = self.encoder_attn(self.encoder_attn_layer_norm(x), kv_source=cross_kv)
        x = x + h
        h = self.final_layer_norm(x)
        h = _maybe_deq(self.fc2(jax.nn.gelu(_maybe_deq(self.fc1(h)), approximate=False)))
        return x + h, new_cache


class WhisperEncoder(nnx.Module):
    def __init__(self, c: WhisperConfig, rngs: nnx.Rngs):
        self.conv1 = WhisperConv1d(c.num_mel_bins, c.d_model, 3, 1, c.dtype, rngs)
        self.conv2 = WhisperConv1d(c.d_model, c.d_model, 3, 2, c.dtype, rngs)
        # Sinusoidal table; the HF checkpoint stores it, so it is loaded as a
        # plain weight rather than recomputed.
        self.embed_positions = nnx.Embed(c.max_source_positions, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([WhisperEncoderLayer(c, rngs) for _ in range(c.encoder_layers)])
        self.layer_norm = nnx.LayerNorm(c.d_model, epsilon=1e-5, param_dtype=c.dtype, rngs=rngs)


class WhisperDecoder(nnx.Module):
    def __init__(self, c: WhisperConfig, rngs: nnx.Rngs):
        self.embed_tokens = nnx.Embed(c.vocab_size, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.embed_positions = nnx.Embed(c.max_target_positions, c.d_model, param_dtype=c.dtype, rngs=rngs)
        self.layers = nnx.List([WhisperDecoderLayer(c, rngs) for _ in range(c.decoder_layers)])
        self.layer_norm = nnx.LayerNorm(c.d_model, epsilon=1e-5, param_dtype=c.dtype, rngs=rngs)


class WhisperModel(nnx.Module):
    def __init__(self, c: WhisperConfig, rngs: nnx.Rngs):
        self.encoder = WhisperEncoder(c, rngs)
        self.decoder = WhisperDecoder(c, rngs)


class WhisperForConditionalGeneration(nnx.Module):
    """Whisper with HF-compatible module names and the T5-style decode API.
    `proj_out` is tied to the decoder embedding."""

    def __init__(self, config: WhisperConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.model = WhisperModel(config, rngs)

    # --- encoder ---

    def encode(self, input_features: jnp.ndarray) -> jnp.ndarray:
        """Log-mel features [B, num_mel_bins, T] (HF layout) -> [B, T//2, D]."""
        enc = self.model.encoder
        x = jnp.transpose(input_features, (0, 2, 1))  # NWC
        x = jax.nn.gelu(enc.conv1(x), approximate=False)
        x = jax.nn.gelu(enc.conv2(x), approximate=False)
        S = x.shape[1]
        x = x + enc.embed_positions.embedding.get_value()[None, :S].astype(x.dtype)
        for layer in enc.layers:
            x = layer(x)
        return enc.layer_norm(x)

    # --- decoder ---

    def _lm_logits(self, x):
        from ..tensor.qarray import QArray

        # x is quantized when the final QLayerNorm quantizes its output
        # (activations=... models); the tied-embedding projection is a plain
        # jnp matmul, so dequantize first.
        x = _maybe_deq(x)
        emb = self.model.decoder.embed_tokens.embedding.get_value()
        if isinstance(emb, QArray):
            emb = emb.dequantize()
        return x @ emb.T.astype(x.dtype)

    def init_decoder_cache(self, enc_hidden: jnp.ndarray, max_len: int, dtype=None, kv_quant=None):
        c = self.config
        if max_len > c.max_target_positions:
            # The learned position table ends here; silently clamping (JAX's
            # default out-of-bounds gather) would reuse the last row's
            # embedding for every later token. HF raises too.
            raise ValueError(
                f"decoder cache length {max_len} exceeds max_target_positions "
                f"{c.max_target_positions}"
            )
        B = enc_hidden.shape[0]
        cross = tuple(
            layer.encoder_attn.kv(enc_hidden) for layer in self.model.decoder.layers
        )
        if kv_quant is not None:
            from ..tensor.kv_cache import init_quantized_kv_cache
            qt = kv_quant  # qtype or KV spec name; parsed by init_quantized_kv_cache
            self_cache = init_quantized_kv_cache(
                c.decoder_layers, B, max_len, c.decoder_attention_heads,
                c.d_model // c.decoder_attention_heads, qt,
            )
        else:
            shape = (B, max_len, c.decoder_attention_heads, c.d_model // c.decoder_attention_heads)
            dt = dtype or c.dtype
            self_cache = tuple(
                (jnp.zeros(shape, dt), jnp.zeros(shape, dt)) for _ in range(c.decoder_layers)
            )
        return (self_cache, cross, None)

    def __call__(
        self,
        decoder_input_ids: jnp.ndarray,
        cache=None,
        cache_pos=0,
        input_features: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
    ):
        dec = self.model.decoder
        B, T = decoder_input_ids.shape
        x = dec.embed_tokens(decoder_input_ids)

        if cache is None:
            if T > self.config.max_target_positions:
                raise ValueError(
                    f"decoder sequence length {T} exceeds max_target_positions "
                    f"{self.config.max_target_positions}"
                )
            if encoder_hidden_states is None:
                if input_features is None:
                    raise ValueError("full forward needs input_features or encoder_hidden_states")
                encoder_hidden_states = self.encode(input_features)
            x = x + dec.embed_positions.embedding.get_value()[None, :T].astype(x.dtype)
            causal = jnp.where(
                jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
            )[None, None]
            for layer in dec.layers:
                cross = layer.encoder_attn.kv(encoder_hidden_states)
                x, _ = layer(x, cross, mask=causal)
            x = dec.layer_norm(x)
            return self._lm_logits(x), None

        self_cache, cross, _ = cache
        from ..tensor.kv_cache import cache_max_len

        max_len = cache_max_len(self_cache[0])
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)  # [1,1] or [B,1]
        q_pos = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        x = x + dec.embed_positions.embedding.get_value().astype(x.dtype)[q_pos]
        k_pos = jnp.arange(max_len)
        mask = jnp.where(
            k_pos[None, None, None, :] <= q_pos[:, None, :, None],
            0.0,
            jnp.finfo(jnp.float32).min,
        )
        new_self = []
        for i, layer in enumerate(dec.layers):
            x, lc = layer(x, cross[i], mask=mask, layer_cache=self_cache[i], cache_pos=cache_pos)
            new_self.append(lc)
        x = dec.layer_norm(x)
        return self._lm_logits(x), (tuple(new_self), cross, None)

    # --- convenience generation ---

    def generate(self, input_features: jnp.ndarray, max_new_tokens: int, kv_quant=None) -> jnp.ndarray:
        c = self.config
        B = input_features.shape[0]
        enc = self.encode(input_features)
        cache = self.init_decoder_cache(enc, max_new_tokens + 1, kv_quant=kv_quant)
        tok = jnp.full((B, 1), c.decoder_start_token_id, jnp.int32)
        out = [tok]
        for t in range(max_new_tokens):
            logits, cache = self(tok, cache, t)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(tok.dtype)[:, None]
            out.append(tok)
        return jnp.concatenate(out, axis=1)
