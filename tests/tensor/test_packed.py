import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanto_tpu import PackedArray
from quanto_tpu.ops import pack_weights, unpack_weights


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("shape", [(12,), (32, 32), (10, 32), (9, 4, 4)])
def test_pack_unpack_roundtrip(bits, shape):
    key = jax.random.PRNGKey(42)
    t = jax.random.randint(key, shape, 0, 2**bits, dtype=jnp.int32).astype(jnp.uint8)
    packed = pack_weights(t, bits)
    assert packed.dtype == jnp.uint8
    expected_rows = -(-shape[0] // (8 // bits))
    assert packed.shape[0] == expected_rows
    unpacked = unpack_weights(packed, bits, shape[0])
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(t))


def test_pack_matches_reference_layout():
    # Bit-exact check of the serialized format against the documented
    # reference behavior (packed.py:24-69): value at row i*row_dim + r
    # occupies bits [bits*i, bits*(i+1)) of byte r.
    t = jnp.array([[3], [2], [1], [0]], dtype=jnp.uint8)
    packed = pack_weights(t, 2)
    # rows: plane0=3, plane1=2, plane2=1, plane3=0 -> 0b00_01_10_11 = 0x1B
    assert packed.shape == (1, 1)
    assert int(packed[0, 0]) == 0b00011011


def test_packed_array_pytree():
    t = jnp.arange(64, dtype=jnp.uint8).reshape(16, 4) % 16
    p = PackedArray.pack(t, 4)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    assert len(leaves) == 1
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert p2.bits == 4 and p2.orig_shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(p2.unpack()), np.asarray(t))


def test_packed_array_jit():
    t = jnp.arange(64, dtype=jnp.uint8).reshape(16, 4) % 16
    p = PackedArray.pack(t, 4)

    @jax.jit
    def unpack(p):
        return p.unpack()

    np.testing.assert_array_equal(np.asarray(unpack(p)), np.asarray(t))
