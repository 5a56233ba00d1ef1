import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import qfloat8_e4m3fn, qfloat8_e5m2, qint2, qint4, qint8
from quanto_tpu.ops import (
    dequantize_affine,
    dequantize_symmetric,
    quantize_affine,
    quantize_symmetric,
)

from ..helpers import random_tensor


@pytest.mark.parametrize("qt", [qint8, qfloat8_e4m3fn, qfloat8_e5m2])
def test_quantize_symmetric_per_tensor_roundtrip(qt):
    t = random_tensor((32, 64))
    scale = jnp.max(jnp.abs(t)) / qt.qmax
    data = quantize_symmetric(t, qt, None, scale)
    assert data.dtype == qt.dtype
    out = dequantize_symmetric(data, scale)
    err = np.mean(np.abs(np.asarray(out) - np.asarray(t)))
    assert err < (0.01 if qt is qint8 else 0.1)


def test_quantize_symmetric_per_axis():
    t = random_tensor((32, 64))
    scale = jnp.max(jnp.abs(t), axis=1, keepdims=True) / qint8.qmax
    data = quantize_symmetric(t, qint8, 0, scale)
    out = dequantize_symmetric(data, scale)
    assert np.mean(np.abs(np.asarray(out) - np.asarray(t))) < 0.01
    # values at max must hit qmax exactly
    assert np.max(np.abs(np.asarray(data))) == 127


def test_quantize_symmetric_validation():
    t = random_tensor((32, 64))
    with pytest.raises(ValueError):
        quantize_symmetric(t, qint8, None, jnp.ones((32, 1)))
    with pytest.raises(ValueError):
        # middle axis is invalid (only first/last are supported)
        quantize_symmetric(random_tensor((4, 8, 16)), qint8, 1, jnp.ones((1, 8, 1)))
    with pytest.raises(ValueError):
        quantize_symmetric(random_tensor((8,)), qint8, 0, jnp.ones((8,)))


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("axis", [0, -1])
@pytest.mark.parametrize("group_size", [None, 8])
def test_quantize_affine_roundtrip(bits, axis, group_size):
    qt = qint2 if bits == 2 else qint4
    t = random_tensor((32, 32))
    from quanto_tpu import MaxOptimizer
    from quanto_tpu.tensor.grouped import ungroup

    scale, shift = MaxOptimizer()(t, qt, axis=axis, group_size=group_size)
    data = quantize_affine(t, bits, axis, group_size, scale, shift)
    assert data.dtype == jnp.uint8
    assert int(jnp.max(data)) <= 2**bits - 1
    out = dequantize_affine(data, scale, shift)
    out = ungroup(out, axis, t.shape)
    err = np.mean(np.abs(np.asarray(out) - np.asarray(t)))
    assert err < (0.4 if bits == 2 else 0.1)


def test_quantize_affine_zeropoint():
    t = random_tensor((32, 32))
    from quanto_tpu import MaxOptimizer

    scale, shift = MaxOptimizer()(t, qint4, axis=0, group_size=None, zeropoint=True)
    assert shift.dtype == jnp.uint8
    data = quantize_affine(t, 4, 0, None, scale, shift)
    out = dequantize_affine(data, scale, shift)
    assert np.mean(np.abs(np.asarray(out) - np.asarray(t))) < 0.15
