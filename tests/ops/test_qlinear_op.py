import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import qfloat8, qint4, qint8, quantize_activation, AbsmaxOptimizer
from quanto_tpu.ops import qlinear

from ..helpers import assert_similar, random_qweight, random_tensor


@pytest.mark.parametrize("qt", [qint8, qfloat8])
@pytest.mark.parametrize("batch", [(10,), (2, 10)])
def test_qlinear_weight_only_qbytes(qt, batch):
    w = random_qweight((64, 32), qt, axis=0, key=jax.random.PRNGKey(1))
    x = random_tensor(batch + (32,), key=jax.random.PRNGKey(2))
    out = qlinear(x, w)
    ref = x @ w.dequantize().T
    assert out.shape == batch + (64,)
    assert_similar(out, ref, rtol=1e-4)


@pytest.mark.parametrize("group_size", [None, 16])
def test_qlinear_weight_only_qbits(group_size):
    w = random_qweight((64, 32), qint4, axis=0, group_size=group_size, key=jax.random.PRNGKey(1))
    x = random_tensor((10, 32), key=jax.random.PRNGKey(2))
    out = qlinear(x, w)
    ref = x @ w.dequantize().T
    assert_similar(out, ref, rtol=1e-4)


def test_qlinear_int8_int8():
    w = random_qweight((64, 32), qint8, axis=0, key=jax.random.PRNGKey(1))
    x = random_tensor((16, 32), key=jax.random.PRNGKey(2))
    scale = AbsmaxOptimizer()(x, qint8, None)
    qx = quantize_activation(x, qint8, scale)
    out = qlinear(qx, w)
    # oracle: float matmul on dequantized operands (reference test_mm.py style)
    ref = qx.dequantize() @ w.dequantize().T
    assert_similar(out, ref, rtol=5e-3)
    assert out.dtype == jnp.float32


def test_qlinear_bias_and_jit():
    w = random_qweight((64, 32), qint8, axis=0)
    x = random_tensor((10, 32))
    bias = random_tensor((64,))
    jitted = jax.jit(qlinear)
    out = jitted(x, w, bias)
    ref = x @ w.dequantize().T + bias
    assert_similar(out, ref, rtol=1e-4)


def test_qlinear_grad_flows_to_input():
    w = random_qweight((64, 32), qint8, axis=0)
    x = random_tensor((10, 32))

    def loss(x):
        return jnp.sum(qlinear(x, w))

    g = jax.grad(loss)(x)
    expected = jnp.sum(w.dequantize(), axis=0) * jnp.ones((10, 1))
    assert_similar(g, expected, rtol=1e-4)
