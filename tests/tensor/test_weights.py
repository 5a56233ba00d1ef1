import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import (
    AbsmaxOptimizer,
    MaxOptimizer,
    WeightQBitsArray,
    WeightQBytesArray,
    fake_quantize_weight,
    qfloat8,
    qint2,
    qint4,
    qint8,
    quantize_weight,
)

from ..helpers import assert_similar, random_tensor


@pytest.mark.parametrize("qt", [qint8, qfloat8])
@pytest.mark.parametrize("axis", [0, -1])
def test_weight_qbytes_quantize(qt, axis):
    t = random_tensor((32, 64))
    scale = AbsmaxOptimizer()(t, qt, axis)
    qw = quantize_weight(t, qt, axis, scale)
    assert isinstance(qw, WeightQBytesArray)
    assert qw.qtype is qt
    assert qw.shape == (32, 64)
    assert qw.dtype == jnp.float32
    assert_similar(qw.dequantize(), t, rtol=1e-3 if qt is qint8 else 2e-2)


def test_weight_qbytes_8bit_rejects_shift_and_groups():
    t = random_tensor((32, 64))
    scale = AbsmaxOptimizer()(t, qint8, 0)
    with pytest.raises(ValueError):
        quantize_weight(t, qint8, 0, scale, shift=jnp.zeros((32, 1)))
    with pytest.raises(ValueError):
        quantize_weight(t, qint8, 0, scale, group_size=16)
    with pytest.raises(ValueError):
        quantize_weight(t, qint8, 1, scale)


@pytest.mark.parametrize("qt", [qint2, qint4])
@pytest.mark.parametrize("axis", [0, -1])
@pytest.mark.parametrize("group_size", [None, 16])
def test_weight_qbits_quantize(qt, axis, group_size):
    t = random_tensor((32, 64))
    scale, shift = MaxOptimizer()(t, qt, axis=axis, group_size=group_size)
    qw = quantize_weight(t, qt, axis, scale, shift=shift, group_size=group_size)
    assert isinstance(qw, WeightQBitsArray)
    assert qw.shape == (32, 64)
    rtol = 0.3 if qt is qint2 else 2e-2
    assert_similar(qw.dequantize(), t, rtol=rtol)


def test_weight_qbits_requires_shift():
    t = random_tensor((32, 64))
    scale, _ = MaxOptimizer()(t, qint4, axis=0)
    with pytest.raises(ValueError):
        quantize_weight(t, qint4, 0, scale)


def test_weight_pytree_and_jit():
    t = random_tensor((32, 64))
    scale, shift = MaxOptimizer()(t, qint4, axis=0, group_size=16)
    qw = quantize_weight(t, qint4, 0, scale, shift=shift, group_size=16)

    leaves, treedef = jax.tree_util.tree_flatten(qw)
    assert len(leaves) == 3  # packed data, scale, shift
    qw2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(qw2.dequantize()), np.asarray(qw.dequantize()))

    @jax.jit
    def deq(qw):
        return qw.dequantize()

    # jit may fuse the scale multiply into an FMA: allow 1-ulp differences.
    np.testing.assert_allclose(
        np.asarray(deq(qw)), np.asarray(qw.dequantize()), rtol=1e-6, atol=1e-7
    )


def test_weight_qbytes_transpose():
    t = random_tensor((32, 64))
    scale = AbsmaxOptimizer()(t, qint8, 0)
    qw = quantize_weight(t, qint8, 0, scale)
    qwt = qw.transpose()
    assert qwt.shape == (64, 32)
    assert qwt.axis == -1
    np.testing.assert_array_equal(
        np.asarray(qwt.dequantize()), np.asarray(qw.dequantize()).T
    )


def test_fake_quantize_weight_ste():
    t = random_tensor((16, 32))
    scale, shift = MaxOptimizer()(t, qint4, axis=0, group_size=16)

    def loss(w):
        return jnp.sum(fake_quantize_weight(w, qint4, 0, scale, shift, 16) ** 2)

    g = jax.grad(loss)(t)
    # STE: gradient of sum(fq(w)^2) wrt w == 2*fq(w) (identity through quantizer)
    fq = fake_quantize_weight(t, qint4, 0, scale, shift, 16)
    assert_similar(g, 2 * fq, rtol=1e-5)


def test_fake_quantize_weight_qbytes_ste():
    t = random_tensor((16, 32))
    scale = AbsmaxOptimizer()(t, qint8, 0)

    def loss(w):
        return jnp.sum(fake_quantize_weight(w, qint8, 0, scale, None, None))

    g = jax.grad(loss)(t)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(t)))
