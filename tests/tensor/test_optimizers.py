import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import (
    AbsmaxOptimizer,
    HqqOptimizer,
    MaxOptimizer,
    qint4,
    qint8,
    quantize_weight,
)

from ..helpers import random_tensor


def test_absmax_per_tensor():
    t = random_tensor((32, 64))
    scale = AbsmaxOptimizer()(t, qint8, None)
    assert scale.shape == ()
    np.testing.assert_allclose(float(scale), float(jnp.max(jnp.abs(t))) / 127.0, rtol=1e-6)


@pytest.mark.parametrize("axis", [0, -1])
def test_absmax_per_axis(axis):
    t = random_tensor((32, 64))
    scale = AbsmaxOptimizer()(t, qint8, axis)
    expected_shape = (32, 1) if axis == 0 else (1, 64)
    assert tuple(scale.shape) == expected_shape


def test_max_optimizer_shift_covers_range():
    t = random_tensor((32, 64))
    scale, shift = MaxOptimizer()(t, qint4, axis=0, group_size=16)
    assert scale.shape == (128, 1) and shift.shape == (128, 1)
    # codes must span [0, 15] within rounding
    qw = quantize_weight(t, qint4, 0, scale, shift=shift, group_size=16)
    codes = qw.data.unpack()
    assert int(jnp.min(codes)) == 0
    assert int(jnp.max(codes)) == 15


def test_hqq_beats_max():
    # HQQ refinement should not be worse than the Max baseline
    # (reference test: tests/tensor/optimizers/test_hqq_optimizer.py).
    t = random_tensor((64, 64)) + 0.3  # skew so affine shift matters
    max_scale, max_shift = MaxOptimizer()(t, qint4, axis=0, group_size=16)
    hqq_scale, hqq_shift = HqqOptimizer(iters=10)(t, qint4, axis=0, group_size=16)
    qw_max = quantize_weight(t, qint4, 0, max_scale, shift=max_shift, group_size=16)
    qw_hqq = quantize_weight(t, qint4, 0, hqq_scale, shift=hqq_shift, group_size=16)
    err_max = float(jnp.mean(jnp.abs(qw_max.dequantize() - t)))
    err_hqq = float(jnp.mean(jnp.abs(qw_hqq.dequantize() - t)))
    assert err_hqq <= err_max + 1e-6
