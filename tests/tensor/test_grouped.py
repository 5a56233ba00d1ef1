import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import group, grouped_shape, ungroup

from ..helpers import random_tensor


@pytest.mark.parametrize("shape", [(16, 32), (8, 64)])
@pytest.mark.parametrize("axis", [0, -1])
@pytest.mark.parametrize("group_size", [4, 8])
def test_group_ungroup_roundtrip(shape, axis, group_size):
    t = random_tensor(shape)
    g = group(t, axis, group_size)
    assert tuple(g.shape) == grouped_shape(shape, axis, group_size)
    u = ungroup(g, axis, shape)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(t))


def test_group_axis0_rows_are_contiguous():
    t = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    g = group(t, 0, 2)
    np.testing.assert_array_equal(np.asarray(g[0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(g[1]), [2, 3])


def test_group_invalid():
    t = random_tensor((16, 32))
    with pytest.raises(ValueError):
        group(t, 1, 8)
    with pytest.raises(ValueError):
        group(t, 0, 5)  # not a divisor
