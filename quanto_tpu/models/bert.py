"""BERT sequence-classification encoder in flax NNX.

The torch reference's text-classification example quantizes an
`AutoModelForSequenceClassification` checkpoint
(`examples/nlp/text-classification/sst2/quantize_sst2_model.py:22-80`, the
BERT architecture class); this module implements it natively. HF
`transformers/models/bert/modeling_bert.py` semantics:

- Embeddings: word + learned absolute position + token-type, then LayerNorm
  (post-embedding norm, eps 1e-12 by default).
- Encoder layers are POST-norm: `x = LN(x + attn(x))` then
  `x = LN(x + out_dense(gelu(intermediate(x))))`.
- Attention scores scaled by head_dim**-0.5; additive mask from a [B, T]
  attention_mask (0 → -inf) matches HF's get_extended_attention_mask.
- Pooler: tanh(dense(CLS)); classifier reads the pooled output.

Module attribute names mirror the HF layout
(`bert.encoder.layer.N.attention.self.query`, ...) so
`loading.load_hf_state_dict` maps checkpoints with no renaming table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


__all__ = ["BertConfig", "BertForSequenceClassification"]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    num_labels: int = 2
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, config, dtype=jnp.bfloat16) -> "BertConfig":
        num_labels = getattr(config, "num_labels", None) or len(
            getattr(config, "id2label", {0: None, 1: None})
        )
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            intermediate_size=config.intermediate_size,
            max_position_embeddings=config.max_position_embeddings,
            type_vocab_size=config.type_vocab_size,
            layer_norm_eps=config.layer_norm_eps,
            num_labels=num_labels,
            dtype=dtype,
        )


def _maybe_deq(x):
    from ..tensor.qarray import QArray

    return x.dequantize() if isinstance(x, QArray) else x


class BertEmbeddings(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        emb = lambda n: nnx.Embed(n, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.word_embeddings = emb(c.vocab_size)
        self.position_embeddings = emb(c.max_position_embeddings)
        self.token_type_embeddings = emb(c.type_vocab_size)
        self.LayerNorm = nnx.LayerNorm(
            c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, input_ids, token_type_ids=None):
        B, T = input_ids.shape
        x = self.word_embeddings(input_ids)
        x = x + self.position_embeddings.embedding.get_value()[None, :T].astype(x.dtype)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + self.token_type_embeddings(token_type_ids)
        return self.LayerNorm(x)


class BertSelfAttention(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.num_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        mk = lambda: nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.query = mk()
        self.key = mk()
        self.value = mk()

    def __call__(self, x, mask=None):
        B, T, C = x.shape
        H, D = self.num_heads, self.head_dim
        q = _maybe_deq(self.query(x)).reshape(B, T, H, D)
        k = _maybe_deq(self.key(x)).reshape(B, T, H, D)
        v = _maybe_deq(self.value(x)).reshape(B, T, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (D**-0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, C)


class BertSelfOutput(nnx.Module):
    """dense + residual + POST-norm (HF BertSelfOutput)."""

    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.LayerNorm = nnx.LayerNorm(
            c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, x, residual):
        # The residual may arrive quantized (previous QLayerNorm output).
        return self.LayerNorm(_maybe_deq(self.dense(x)) + _maybe_deq(residual))


class BertAttention(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.self = BertSelfAttention(c, rngs)
        self.output = BertSelfOutput(c, rngs)

    def __call__(self, x, mask=None):
        return self.output(self.self(x, mask), x)


class BertIntermediate(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.hidden_size, c.intermediate_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):
        return jax.nn.gelu(_maybe_deq(self.dense(x)), approximate=False)


class BertOutput(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.intermediate_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)
        self.LayerNorm = nnx.LayerNorm(
            c.hidden_size, epsilon=c.layer_norm_eps, param_dtype=c.dtype, rngs=rngs
        )

    def __call__(self, x, residual):
        # The residual may arrive quantized (previous QLayerNorm output).
        return self.LayerNorm(_maybe_deq(self.dense(x)) + _maybe_deq(residual))


class BertLayer(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.attention = BertAttention(c, rngs)
        self.intermediate = BertIntermediate(c, rngs)
        self.output = BertOutput(c, rngs)

    def __call__(self, x, mask=None):
        x = self.attention(x, mask)
        return self.output(self.intermediate(x), x)


class BertEncoder(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.layer = nnx.List([BertLayer(c, rngs) for _ in range(c.num_hidden_layers)])


class BertPooler(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.dense = nnx.Linear(c.hidden_size, c.hidden_size, param_dtype=c.dtype, rngs=rngs)

    def __call__(self, x):  # x: [B, T, C]; pool the CLS token
        from ..ops.qops import qslice

        return jnp.tanh(_maybe_deq(self.dense(qslice(x, (slice(None), 0)))))


class BertModel(nnx.Module):
    def __init__(self, c: BertConfig, rngs: nnx.Rngs):
        self.embeddings = BertEmbeddings(c, rngs)
        self.encoder = BertEncoder(c, rngs)
        self.pooler = BertPooler(c, rngs)


class BertForSequenceClassification(nnx.Module):
    """BERT with HF-compatible module names; returns classification logits."""

    def __init__(self, config: BertConfig, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.bert = BertModel(config, rngs)
        self.classifier = nnx.Linear(
            config.hidden_size, config.num_labels, param_dtype=config.dtype, rngs=rngs
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x = self.bert.embeddings(input_ids, token_type_ids)
        mask = None
        if attention_mask is not None:
            # HF get_extended_attention_mask: [B, T] 1/0 -> additive [B,1,1,T].
            mask = jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min
            )
        for layer in self.bert.encoder.layer:
            x = layer(x, mask)
        pooled = self.bert.pooler(x)
        return _maybe_deq(self.classifier(pooled))
