"""Streamline tests (reference `Calibration(streamline=True)` semantics,
`calibrate.py:90-105,158-164`): output quantization survives only for
modules whose outputs are consumed as quantized arrays."""

import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.ops import qops

from ..helpers import random_tensor


class MLP(nnx.Module):
    """fc1 output goes through relu via dequantize -> incompatible consumer."""

    def __init__(self, rngs):
        self.fc1 = nnx.Linear(32, 64, rngs=rngs)
        self.fc2 = nnx.Linear(64, 16, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = jax.nn.relu(qops.dequantize(h))
        return qops.dequantize(self.fc2(h))


class QKPipe(nnx.Module):
    """q/k outputs feed an int8 matmul -> quantization-compatible consumer."""

    def __init__(self, rngs):
        self.q_proj = nnx.Linear(32, 32, use_bias=False, rngs=rngs)
        self.k_proj = nnx.Linear(32, 32, use_bias=False, rngs=rngs)

    def __call__(self, x):
        q = self.q_proj(x)
        k = self.k_proj(x)
        if isinstance(q, qt.ActivationQBytesArray):
            kt = qops.qtranspose(k, (0, 2, 1))
            return qops.qmatmul(q, kt)
        return q @ jnp.transpose(k, (0, 2, 1))


def test_streamline_disables_dequantized_consumers():
    model = MLP(nnx.Rngs(0))
    qt.quantize(model, weights="qint8", activations="qint8")
    x = random_tensor((4, 32), key=jax.random.PRNGKey(1))
    assert model.fc1.quantize_outputs and model.fc2.quantize_outputs
    with qt.Calibration(model):
        model(x)
    # Both outputs were only ever dequantized.
    assert not model.fc1.quantize_outputs
    assert not model.fc2.quantize_outputs
    out = model(x)
    assert not isinstance(out, qt.ActivationQBytesArray)


def test_streamline_keeps_quantized_consumers():
    model = QKPipe(nnx.Rngs(0))
    qt.quantize(model, weights="qint8", activations="qint8")
    x = random_tensor((2, 8, 32), key=jax.random.PRNGKey(2))
    with qt.Calibration(model):
        model(x)
    # q and k feed the int8 matmul as quantized arrays: kept.
    assert model.q_proj.quantize_outputs
    assert model.k_proj.quantize_outputs


def test_streamline_false_keeps_everything():
    model = MLP(nnx.Rngs(0))
    qt.quantize(model, weights="qint8", activations="qint8")
    x = random_tensor((4, 32), key=jax.random.PRNGKey(3))
    with qt.Calibration(model, streamline=False):
        model(x)
    assert model.fc1.quantize_outputs
    assert model.fc2.quantize_outputs
