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


def test_from_serialized_host_matches_device_optimize():
    """Checkpoint load path: the native host repack produces the exact
    WeightQBitsTpuArray the device-side optimize() builds."""
    from quanto_tpu.tensor.qtype import qint4
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray, quantize_weight
    from quanto_tpu.tensor.optimizers import MaxOptimizer

    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(128, 256), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128)
    ref = qw.optimize()
    assert isinstance(ref, WeightQBitsTpuArray)

    got = WeightQBitsTpuArray.from_serialized_host(
        np.asarray(qw._data._data), np.asarray(qw._scale), np.asarray(qw._shift),
        qint4, 128, (128, 256), jnp.float32,
    )
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got._packed), np.asarray(ref._packed))
    np.testing.assert_allclose(np.asarray(got._scale_t), np.asarray(ref._scale_t))
    np.testing.assert_allclose(np.asarray(got._shift_t), np.asarray(ref._shift_t))


def test_load_state_dict_uses_native_repack():
    """End-to-end: loading an int4 checkpoint with the pallas backend forced
    on yields kernel-layout weights and identical dequantized values."""
    from flax import nnx

    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.serialization import load_state_dict, state_dict
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray

    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(256, 128, use_bias=False, param_dtype=jnp.float32, rngs=rngs)

    model = MLP(nnx.Rngs(0))
    qt.quantize(model, weights="qint4")
    qt.freeze(model)
    sd = {k: np.asarray(v) for k, v in state_dict(model).items()}
    ref = model.fc.weight.get_value().dequantize()

    model2 = MLP(nnx.Rngs(1))
    qt.quantize(model2, weights="qint4")
    ops_config.set_backend(pallas_qbits=True)
    try:
        load_state_dict(model2, sd, strict=False)
    finally:
        ops_config.set_backend()
    qw = model2.fc.weight.get_value()
    assert isinstance(qw, WeightQBitsTpuArray)
    np.testing.assert_allclose(
        np.asarray(qw.dequantize()), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
