"""Hand-written attention block quantized end-to-end (reference
`tests/nn/test_qattention.py` analogue): QLinear projections with int8
activations, int8 q@k matmul via qops, softmax requantization."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.nn import QLinear
from quanto_tpu.ops import qops

from ..helpers import assert_similar, random_tensor


class Attention(nnx.Module):
    def __init__(self, dim, heads, rngs, weights=None, activations=None):
        self.heads = heads
        kw = dict(use_bias=False, rngs=rngs)
        self.q_proj = nnx.Linear(dim, dim, **kw)
        self.k_proj = nnx.Linear(dim, dim, **kw)
        self.v_proj = nnx.Linear(dim, dim, **kw)
        self.o_proj = nnx.Linear(dim, dim, **kw)

    def __call__(self, x):
        B, T, D = x.shape
        h = self.heads
        q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q, k, v = (qops.dequantize(a) for a in (q, k, v))
        q = q.reshape(B, T, h, D // h)
        k = k.reshape(B, T, h, D // h)
        v = v.reshape(B, T, h, D // h)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D // h) ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        return qops.dequantize(self.o_proj(out))


def test_quantized_attention_matches_float():
    attn = Attention(64, 4, nnx.Rngs(0))
    x = random_tensor((2, 8, 64), key=jax.random.PRNGKey(1))
    ref = attn(x)
    qt.quantize(attn, weights="qint8", activations="qint8")
    with qt.Calibration(attn):
        attn(x)
    qt.freeze(attn)
    assert isinstance(attn.q_proj, QLinear)
    out = attn(x)
    assert_similar(out, ref, rtol=5e-2)


def test_int8_qk_matmul_via_qops():
    """q @ k^T computed on int8 codes (the reference's int8 bmm dispatch)."""
    key = jax.random.PRNGKey(0)
    q = random_tensor((2, 8, 32), key=key)
    k = random_tensor((2, 8, 32), key=jax.random.PRNGKey(1))
    qa = qt.quantize_activation(q, qt.qint8, qt.absmax_scale(q))
    ka = qt.quantize_activation(k, qt.qint8, qt.absmax_scale(k))
    ka_t = qops.qtranspose(ka, (0, 2, 1))
    out = qops.qmatmul(qa, ka_t)
    ref = q @ jnp.transpose(k, (0, 2, 1))
    assert_similar(out, ref, rtol=1e-3)
