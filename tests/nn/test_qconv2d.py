"""QConv2d tests (reference `tests/nn/test_qconv2d.py` analogue): quantized
conv vs float conv on dequantized weights, freeze, serialization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.nn import QConv2d

from ..helpers import assert_similar, random_tensor


def _make_pair(weights=qt.qint8, activations=None):
    rngs = nnx.Rngs(0)
    conv = nnx.Conv(3, 32, (3, 3), strides=1, padding="SAME", rngs=rngs)
    qconv = QConv2d.from_module(conv, weights=weights, activations=activations)
    return conv, qconv


@pytest.mark.parametrize("qtype_name", ["qint8", "qfloat8_e4m3fn"])
def test_qconv2d_weight_only(qtype_name):
    conv, qconv = _make_pair(weights=qt.qtypes[qtype_name])
    x = random_tensor((2, 8, 8, 3), key=jax.random.PRNGKey(1))
    out = qconv(x)
    ref = conv(x)
    assert out.shape == ref.shape
    assert_similar(out, ref, rtol=1e-2)


def test_qconv2d_freeze_and_serialize():
    _, qconv = _make_pair()
    x = random_tensor((2, 8, 8, 3), key=jax.random.PRNGKey(2))
    dyn = qconv(x)
    qconv.freeze()
    assert qconv.frozen
    frozen = qconv(x)
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(frozen), rtol=1e-5, atol=1e-6)
    sd = qt.state_dict(qconv)
    assert "weight._data" in sd
    assert sd["weight._data"].shape == (32, 3, 3, 3)  # OIHW

    conv2 = nnx.Conv(3, 32, (3, 3), strides=1, padding="SAME", rngs=nnx.Rngs(7))
    qconv2 = QConv2d.from_module(conv2, weights=qt.qint8)
    qt.load_state_dict(qconv2, sd)
    out2 = qconv2(x)
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_quantize_walks_conv_models():
    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv1 = nnx.Conv(3, 16, (3, 3), rngs=rngs)
            self.conv2 = nnx.Conv(16, 8, (1, 1), rngs=rngs)

        def __call__(self, x):
            return self.conv2(jax.nn.relu(self.conv1(x)))

    net = Net(nnx.Rngs(0))
    x = random_tensor((1, 8, 8, 3), key=jax.random.PRNGKey(3))
    ref = net(x)
    qt.quantize(net, weights="qint8")
    assert isinstance(net.conv1, QConv2d)
    out = net(x)
    assert_similar(out, ref, rtol=1e-2)
