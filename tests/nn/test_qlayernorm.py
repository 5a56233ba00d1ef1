"""QLayerNorm tests (reference `tests/nn/test_qlayernorm.py` analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.nn import QLayerNorm

from ..helpers import assert_similar, random_tensor


def test_qlayernorm_requires_activations():
    ln = nnx.LayerNorm(16, rngs=nnx.Rngs(0))
    assert QLayerNorm.from_module(ln, activations=None) is None


def test_qlayernorm_quantizes_outputs():
    ln = nnx.LayerNorm(16, rngs=nnx.Rngs(0))
    qln = QLayerNorm.from_module(ln, activations=qt.qint8)
    x = random_tensor((4, 16), key=jax.random.PRNGKey(1))
    with qt.Calibration(qln, streamline=False):
        qln(x)
    out = qln(x)
    assert isinstance(out, qt.ActivationQBytesArray)
    ref = ln(x)
    assert_similar(out.dequantize(), ref, rtol=1e-2)


def test_qlayernorm_never_quantizes_weights():
    ln = nnx.LayerNorm(16, rngs=nnx.Rngs(0))
    qln = QLayerNorm.from_module(ln, activations=qt.qint8)
    assert qln.weight_qtype is None
    assert not qln.frozen
    qln.freeze()  # no-op
    assert not qln.frozen
