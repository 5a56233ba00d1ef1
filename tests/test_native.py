"""Native (C++) helper tests: build, mmap IO, and single-pass repacking
equivalence against the jnp reference path."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import quanto_tpu as qt
from quanto_tpu import native
from quanto_tpu.ops.pack import pack_weights
from quanto_tpu.ops.pallas.qbits_mm import pack_split_half
from quanto_tpu.tensor.grouped import group, ungroup


pytestmark = pytest.mark.skipif(not native.is_available(), reason="no native toolchain")


def test_mmap_view_roundtrip():
    payload = np.arange(4096, dtype=np.uint8)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(payload.tobytes())
        path = f.name
    try:
        mf = native.MappedFile(path)
        assert mf.size == 4096
        np.testing.assert_array_equal(mf.view(0, 4096), payload)
        np.testing.assert_array_equal(mf.view(100, 16), payload[100:116])
        as_i32 = mf.view(0, 4096, np.int32)
        np.testing.assert_array_equal(as_i32, payload.view(np.int32))
        mf.close()
    finally:
        os.unlink(path)


@pytest.mark.parametrize("bits", [2, 4])
@pytest.mark.parametrize("group_size", [128, None])
def test_native_repack_matches_jnp_path(bits, group_size):
    N, K = 128, 512
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 2**bits, size=(N, K)).astype(np.uint8)
    gs = group_size if group_size is not None else K
    grouped = np.asarray(group(jnp.asarray(codes), 0, gs))
    serialized = np.asarray(pack_weights(jnp.asarray(grouped), bits))

    expected = np.asarray(pack_split_half(jnp.asarray(codes), bits))
    out = native.repack_grouped_to_splithalf(serialized, N, K, group_size, bits)
    assert out is not None
    np.testing.assert_array_equal(out, expected)


def test_native_unpack_matches_python():
    lib = native.get_lib()
    import ctypes

    rng = np.random.RandomState(1)
    codes = rng.randint(0, 16, size=(64, 32)).astype(np.uint8)
    packed = np.asarray(pack_weights(jnp.asarray(codes), 4))
    out = np.empty((64, 32), np.uint8)
    rc = lib.qt_unpack(
        np.ascontiguousarray(packed).ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        64, 32, 4,
    )
    assert rc == 0
    np.testing.assert_array_equal(out, codes)
