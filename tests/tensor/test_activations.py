import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import (
    ActivationQBytesArray,
    fake_quantize_activation,
    qfloat8,
    qint4,
    qint8,
    quantize_activation,
)

from ..helpers import assert_similar, random_qactivation, random_tensor


@pytest.mark.parametrize("qt", [qint8, qfloat8])
def test_quantize_activation(qt):
    qa = random_qactivation((10, 32), qt)
    assert isinstance(qa, ActivationQBytesArray)
    assert qa.qtype is qt
    assert qa.shape == (10, 32)


def test_activation_requires_scalar_scale():
    t = random_tensor((10, 32))
    with pytest.raises(ValueError):
        quantize_activation(t, qint8, jnp.ones((10, 1)))
    with pytest.raises(ValueError):
        quantize_activation(t, qint4, jnp.ones(()))


def test_activation_roundtrip_accuracy():
    t = random_tensor((10, 32))
    scale = jnp.max(jnp.abs(t)) / 127.0
    qa = quantize_activation(t, qint8, scale)
    assert_similar(qa.dequantize(), t, rtol=1e-3)


def test_fake_quantize_activation_ste():
    t = random_tensor((10, 32))
    scale = jnp.max(jnp.abs(t)) / 127.0

    def loss(x):
        return jnp.sum(fake_quantize_activation(x, qint8, scale))

    g = jax.grad(loss)(t)
    np.testing.assert_allclose(np.asarray(g), np.ones((10, 32), np.float32))
