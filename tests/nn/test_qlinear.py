"""QLinear module tests, mirroring the reference `tests/nn/test_qlinear.py`:
quantized module vs float module on dequantized weights, freeze behavior,
activation quantization, and QAT gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.nn import QLinear

from ..helpers import assert_similar, random_tensor


def _make_pair(in_features=64, out_features=128, use_bias=True, weights=qt.qint8, activations=None):
    rngs = nnx.Rngs(0)
    linear = nnx.Linear(in_features, out_features, use_bias=use_bias, rngs=rngs)
    qlinear = QLinear.from_module(linear, weights=weights, activations=activations)
    return linear, qlinear


@pytest.mark.parametrize("qtype_name", ["qint4", "qint8", "qfloat8_e4m3fn", "qfloat8_e5m2"])
@pytest.mark.parametrize("use_bias", [True, False])
def test_qlinear_weight_only_vs_dequantized(qtype_name, use_bias):
    weights = qt.qtypes[qtype_name]
    linear, qlinear = _make_pair(use_bias=use_bias, weights=weights)
    x = random_tensor((4, 64), key=jax.random.PRNGKey(3))
    out = qlinear(x)
    # Oracle: float matmul on the dequantized weight.
    wdq = qlinear.qweight.dequantize()
    expected = x @ wdq.T
    if use_bias:
        expected = expected + qlinear.bias.get_value()
    assert_similar(out, expected, rtol=1e-4)
    # And close to the float module output.
    ref = linear(x)
    assert_similar(out, ref, rtol=2e-2 if weights.bits == 4 else 1e-2)


def test_qlinear_freeze_matches_dynamic():
    _, qlinear = _make_pair()
    x = random_tensor((4, 64), key=jax.random.PRNGKey(4))
    dyn = qlinear(x)
    assert not qlinear.frozen
    qlinear.freeze()
    assert qlinear.frozen
    frozen = qlinear(x)
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(frozen), rtol=1e-6)


def test_qlinear_activations_int8():
    linear, qlinear = _make_pair(weights=qt.qint8, activations=qt.qint8)
    x = random_tensor((4, 64), key=jax.random.PRNGKey(5))
    with qt.Calibration(qlinear):
        qlinear(x)
    out = qlinear(x)
    if isinstance(out, qt.ActivationQBytesArray):
        out = out.dequantize()
    ref = linear(x)
    assert_similar(out, ref, rtol=2e-2)


def test_qlinear_from_module_transposes_kernel():
    linear, qlinear = _make_pair()
    kernel = linear.kernel.get_value()
    np.testing.assert_allclose(
        np.asarray(qlinear.weight.get_value()), np.asarray(kernel.T)
    )


def test_qlinear_qat_gradients():
    _, qlinear = _make_pair(weights=qt.qint8, activations=qt.qint8)
    qlinear.qat = True
    x = random_tensor((4, 64), key=jax.random.PRNGKey(6))

    def loss_fn(model, x):
        out = model(x)
        return jnp.mean(jnp.square(out))

    grads = nnx.grad(loss_fn)(qlinear, x)
    gw = grads["weight"].get_value() if isinstance(grads, dict) else grads.weight.get_value()
    gw = np.asarray(gw)
    assert gw.shape == (128, 64)
    assert np.abs(gw).sum() > 0


def test_qlinear_int4_group_size():
    # in_features=160 > 128 and divisible by 32: auto group size selected.
    rngs = nnx.Rngs(0)
    linear = nnx.Linear(160, 64, rngs=rngs)
    qlinear = QLinear.from_module(linear, weights=qt.qint4)
    assert qlinear.weight_group_size == 32
    x = random_tensor((2, 160), key=jax.random.PRNGKey(7))
    out = qlinear(x)
    ref = linear(x)
    assert_similar(out, ref, rtol=5e-2)
