"""Pallas kernel tests (interpret mode on the CPU backend).

Mirrors the reference optimized-tensor tests
(`tests/tensor/weights/optimized/`): the kernel-layout weight equals the
generic tensor numerically, survives the round trip back to the generic
serialized layout, and the fused matmul matches the dequant oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.pallas import (
    pack_split_half,
    qbits_matmul_kernel_call,
    qbytes_matmul_kernel_call,
    unpack_split_half,
)
from quanto_tpu.ops.pallas.qbits_mm import pack_for_kernel, pack_w16
from quanto_tpu.tensor.weights import WeightQBitsTpuArray

from ..helpers import assert_similar, random_qweight, random_tensor


@pytest.fixture(autouse=True)
def force_pallas():
    ops_config.set_backend(pallas_qbits=True, pallas_qbytes=True)
    yield
    ops_config.set_backend(None, None)


@pytest.mark.parametrize("bits", [2, 4])
def test_split_half_pack_roundtrip(bits):
    k = jax.random.PRNGKey(0)
    codes = jax.random.randint(k, (128, 256), 0, 2**bits, jnp.uint8)
    packed = pack_split_half(codes, bits)
    assert packed.shape == (128, 256 * bits // 8)
    np.testing.assert_array_equal(
        np.asarray(unpack_split_half(packed, bits, 256)), np.asarray(codes)
    )


def test_pack_w16_roundtrip():
    k = jax.random.PRNGKey(1)
    codes = jax.random.randint(k, (128, 512), 0, 16, jnp.uint8)
    packed = pack_w16(codes, 4)
    assert packed.shape == (128, 128) and packed.dtype == jnp.int16
    np.testing.assert_array_equal(
        np.asarray(unpack_split_half(packed, 4, 512)), np.asarray(codes)
    )


def test_pack_for_kernel_layout_selection():
    k = jax.random.PRNGKey(2)
    # int4 with (K/4) % 128 == 0 -> w16
    codes = jax.random.randint(k, (128, 512), 0, 16, jnp.uint8)
    assert pack_for_kernel(codes, 4).dtype == jnp.int16
    # int4 with (K/4) % 128 != 0 -> u8 split-half
    codes = jax.random.randint(k, (128, 256), 0, 16, jnp.uint8)
    assert pack_for_kernel(codes, 4).dtype == jnp.uint8
    # int2 stays u8
    codes = jax.random.randint(k, (128, 512), 0, 4, jnp.uint8)
    assert pack_for_kernel(codes, 2).dtype == jnp.uint8


@pytest.mark.parametrize("m", [4, 600])
def test_w16_and_u8_kernels_agree(m):
    """Both payload layouts of the SAME nibbles produce the same matmul
    (decode and prefill routes)."""
    qw = random_qweight((256, 512), qt.qint4, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    assert tpu._packed.dtype == jnp.int16  # w16-eligible shape
    codes = unpack_split_half(tpu._packed, 4, 512)
    u8 = pack_split_half(codes, 4)
    x = random_tensor((m, 512), key=jax.random.PRNGKey(5))
    out16 = qbits_matmul_kernel_call(
        x, tpu._packed, tpu._scale_t, tpu._shift_t, 4, 128, interpret=True
    )
    out8 = qbits_matmul_kernel_call(
        x, u8, tpu._scale_t, tpu._shift_t, 4, 128, interpret=True
    )
    assert out16 is not None and out8 is not None
    ref = x @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("group_size", [128, None])
@pytest.mark.parametrize("qtype_name", ["qint4", "qint2"])
def test_tpu_layout_equals_generic(qtype_name, group_size):
    qw = random_qweight((256, 512), qt.qtypes[qtype_name], group_size=group_size)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    assert tpu is not None
    np.testing.assert_allclose(
        np.asarray(tpu.dequantize()), np.asarray(qw.dequantize()), rtol=1e-5, atol=1e-6
    )
    # Round trip back to the serialized layout is bit-exact on the codes.
    back = tpu.to_generic()
    np.testing.assert_array_equal(
        np.asarray(back._data.packed_data), np.asarray(qw._data.packed_data)
    )
    np.testing.assert_allclose(
        np.asarray(back.dequantize()), np.asarray(qw.dequantize()), rtol=1e-5, atol=1e-6
    )


def test_qbits_kernel_matmul_matches_oracle():
    qw = random_qweight((256, 512), qt.qint4, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    x = random_tensor((4, 512), key=jax.random.PRNGKey(2))
    out = qbits_matmul_kernel_call(
        x, tpu._packed, tpu._scale_t, tpu._shift_t, 4, 128, interpret=True
    )
    ref = x @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_qbytes_kernel_matmul_matches_oracle():
    qw = random_qweight((256, 512), qt.qint8)
    x = random_tensor((4, 512), key=jax.random.PRNGKey(2))
    out = qbytes_matmul_kernel_call(x, qw._data, qw._scale, interpret=True)
    ref = x @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_qlinear_module_uses_tpu_layout_after_freeze():
    from flax import nnx
    from quanto_tpu.nn import QLinear

    linear = nnx.Linear(512, 256, rngs=nnx.Rngs(0))
    qlin = QLinear.from_module(linear, weights=qt.qint4)
    x = random_tensor((4, 512), key=jax.random.PRNGKey(3))
    dyn = qlin(x)
    qlin.freeze()
    assert isinstance(qlin.weight.get_value(), WeightQBitsTpuArray)
    frozen = qlin(x)
    assert_similar(frozen, dyn, rtol=1e-4)
    # Serialization converts back to the generic layout.
    sd = qt.state_dict(qlin)
    assert "weight._data._data" in sd

    # And reload (on a pallas-enabled backend) re-optimizes into the layout.
    linear2 = nnx.Linear(512, 256, rngs=nnx.Rngs(1))
    qlin2 = QLinear.from_module(linear2, weights=qt.qint4)
    qt.load_state_dict(qlin2, sd)
    assert isinstance(qlin2.weight.get_value(), WeightQBitsTpuArray)
    reloaded = qlin2(x)
    np.testing.assert_allclose(np.asarray(reloaded), np.asarray(frozen), rtol=1e-5, atol=1e-5)


def test_w4a8_kernel_matches_dequant_reference():
    """int8-activation x int4-weight fused kernel vs dequantize-both-matmul."""
    from quanto_tpu.ops.pallas.qbits_mm import qbits_int8_matmul_kernel_call
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint4, qint8
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray, quantize_weight
    from quanto_tpu.tensor.activations import quantize_activation

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 256), jnp.float32)
    x = jnp.asarray(rng.randn(8, 256), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128).optimize()
    assert isinstance(qw, WeightQBitsTpuArray)
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))

    out = qbits_int8_matmul_kernel_call(
        qx.data, qx.scale, qw._packed, qw._scale_t, qw._shift_t,
        4, 128, jnp.float32, interpret=True,
    )
    assert out is not None
    ref = qx.dequantize() @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_w4a8_qlinear_dispatch(monkeypatch):
    """qlinear routes int8 activations x TPU-layout int4 weights through the
    fused kernel (float output, same semantics as the dequant fallback)."""
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.ops.qlinear import qlinear
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint4, qint8
    from quanto_tpu.tensor.weights import quantize_weight
    from quanto_tpu.tensor.activations import quantize_activation

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(128, 256), jnp.float32)
    x = jnp.asarray(rng.randn(4, 256), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128).optimize()
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))
    bias = jnp.asarray(rng.randn(128), jnp.float32)

    ops_config.set_backend(pallas_qbits=True)
    try:
        out = qlinear(qx, qw, bias)
    finally:
        ops_config.set_backend()
    ref = qx.dequantize() @ qw.dequantize().T + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fp8_decode_bit_exact_all_codes():
    """The in-kernel integer e4m3fn decode matches the dtype's own convert
    for every non-NaN byte code."""
    from quanto_tpu.ops.pallas.qbytes_mm import _fp8_decode_e4m3

    codes = np.arange(256, dtype=np.uint8)
    ref = np.asarray(
        jax.lax.bitcast_convert_type(jnp.asarray(codes), jnp.float8_e4m3fn).astype(jnp.float32)
    )
    got = np.asarray(_fp8_decode_e4m3(jnp.asarray(codes, jnp.int32), jnp.float32))
    keep = ~np.isnan(ref)
    np.testing.assert_array_equal(got[keep], ref[keep])


def test_fp8_kernel_matmul_matches_oracle():
    from quanto_tpu.ops.pallas.qbytes_mm import qbytes_fp8_matmul_kernel_call

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 128), jnp.float32).astype(jnp.float8_e4m3fn)
    x = jnp.asarray(rng.randn(8, 128), jnp.float32)
    scale = jnp.asarray(np.abs(rng.randn(256, 1)) * 0.1, jnp.float32)
    out = qbytes_fp8_matmul_kernel_call(x, w, scale, interpret=True)
    ref = x @ (w.astype(jnp.float32) * scale).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_fp8_kernel_gating():
    from quanto_tpu.ops.pallas.qbytes_mm import qbytes_fp8_matmul_kernel_call

    x = jnp.zeros((8, 128), jnp.float32)
    w_int8 = jnp.zeros((256, 128), jnp.int8)
    s = jnp.ones((256, 1), jnp.float32)
    assert qbytes_fp8_matmul_kernel_call(x, w_int8, s, interpret=True) is None
    w_f8_bad = jnp.zeros((100, 128), jnp.float8_e4m3fn)
    assert qbytes_fp8_matmul_kernel_call(x, w_f8_bad, jnp.ones((100, 1)), interpret=True) is None


@pytest.mark.parametrize("bits", [4, 2])
@pytest.mark.parametrize("m", [513, 768])
def test_qbits_prefill_kernel_matches_oracle(m, bits):
    """M beyond the decode kernel's VMEM gate routes to the M/N/K-tiled
    prefill kernel (incl. a non-multiple-of-bm M that needs padding).
    int2 exercises the 4-part x-view split."""
    qw = random_qweight((256, 512), qt.qtypes[f"qint{bits}"], group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    x = random_tensor((m, 512), key=jax.random.PRNGKey(3))
    out = qbits_matmul_kernel_call(
        x, tpu._packed, tpu._scale_t, tpu._shift_t, bits, 128, interpret=True
    )
    assert out is not None
    ref = x @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_qbits_prefill_kernel_gates():
    # per-axis (group_size=None) scales stay on the XLA fallback at prefill M
    qw = random_qweight((256, 512), qt.qint4, group_size=None)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    x = random_tensor((600, 512), key=jax.random.PRNGKey(4))
    assert qbits_matmul_kernel_call(
        x, tpu._packed, tpu._scale_t, tpu._shift_t, 4, None, interpret=True
    ) is None


@pytest.mark.parametrize("bits", [4, 2])
def test_w4a8_prefill_kernel_matches_oracle(bits):
    """int8 activations at M>512 route through the tiled prefill kernel on
    the integer MXU (exact int8xint4 dots, so tolerance stays tight)."""
    from quanto_tpu.ops.pallas.qbits_mm import qbits_int8_matmul_kernel_call
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint8
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray, quantize_weight
    from quanto_tpu.tensor.activations import quantize_activation

    qtype = qt.qtypes[f"qint{bits}"]
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(256, 512), jnp.float32)
    x = jnp.asarray(rng.randn(600, 512), jnp.float32)  # M=600: pads to 768
    scale, shift = MaxOptimizer()(w, qtype, axis=0, group_size=128)
    qw = quantize_weight(w, qtype, 0, scale, shift=shift, group_size=128).optimize()
    assert isinstance(qw, WeightQBitsTpuArray)
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))

    out = qbits_int8_matmul_kernel_call(
        qx.data, qx.scale, qw._packed, qw._scale_t, qw._shift_t,
        bits, 128, jnp.float32, interpret=True,
    )
    assert out is not None
    ref = qx.dequantize() @ qw.dequantize().T
    # f32 accumulation order differs across K tiles vs the one-shot oracle
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("k_shards", [2, 4])
@pytest.mark.parametrize("bits", [2, 4])
def test_block_local_pack_roundtrip(bits, k_shards):
    """Block-local (k_shards > 1) payloads round-trip and each column block
    is a standalone packing of its contiguous K block (the property
    row-parallel TP sharding relies on)."""
    k = jax.random.PRNGKey(3)
    K = 2048
    codes = jax.random.randint(k, (128, K), 0, 2**bits, jnp.uint8)
    packed = pack_for_kernel(codes, bits, k_shards)
    np.testing.assert_array_equal(
        np.asarray(unpack_split_half(packed, bits, K, k_shards)), np.asarray(codes)
    )
    kp_b = packed.shape[1] // k_shards
    kb = K // k_shards
    for b in range(k_shards):
        block = packed[:, b * kp_b : (b + 1) * kp_b]
        block_codes = codes[:, b * kb : (b + 1) * kb]
        np.testing.assert_array_equal(
            np.asarray(block), np.asarray(pack_for_kernel(block_codes, bits))
        )


@pytest.mark.parametrize("m", [8, 600])
@pytest.mark.parametrize("k_shards", [2, 4])
def test_qbits_kernel_block_local_matches_oracle(k_shards, m):
    """Decode and prefill kernel routes on the block-local layout."""
    qw = random_qweight((256, 2048), qt.qint4, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw, k_shards=k_shards)
    assert tpu is not None and tpu.k_shards == k_shards
    x = random_tensor((m, 2048), key=jax.random.PRNGKey(2))
    with jax.default_matmul_precision("float32"):
        out = qbits_matmul_kernel_call(
            x, tpu._packed, tpu._scale_t, tpu._shift_t, 4, 128,
            k_shards=k_shards, interpret=True,
        )
        assert out is not None
        ref = x @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_repack_between_k_shards():
    """repack() moves between block counts without touching scale/shift."""
    qw = random_qweight((256, 2048), qt.qint4, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw)
    r4 = tpu.repack(4)
    assert r4 is not None and r4.k_shards == 4
    assert r4._scale_t is tpu._scale_t and r4._shift_t is tpu._shift_t
    np.testing.assert_allclose(
        np.asarray(r4.dequantize()), np.asarray(tpu.dequantize()), rtol=0, atol=0
    )
    back = r4.repack(1)
    np.testing.assert_array_equal(np.asarray(back._packed), np.asarray(tpu._packed))
    # to_generic from a block-local layout is still bit-exact on the codes.
    np.testing.assert_array_equal(
        np.asarray(r4.to_generic()._data.packed_data),
        np.asarray(qw._data.packed_data),
    )
    # Ineligible block counts refuse (gs=128 needs kp_b % gs == 0).
    assert tpu.repack(32) is None


def test_w4a8_kernel_block_local():
    from quanto_tpu.ops.pallas.qbits_mm import qbits_int8_matmul_kernel_call
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint4, qint8
    from quanto_tpu.tensor.weights import quantize_weight
    from quanto_tpu.tensor.activations import quantize_activation

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 1024), jnp.float32)
    x = jnp.asarray(rng.randn(8, 1024), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw, k_shards=2)
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))
    with jax.default_matmul_precision("float32"):
        out = qbits_int8_matmul_kernel_call(
            qx.data, qx.scale, tpu._packed, tpu._scale_t, tpu._shift_t,
            4, 128, jnp.float32, k_shards=2, interpret=True,
        )
        assert out is not None
        ref = qx.dequantize() @ qw.dequantize().T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("k_shards", [1, 2])
def test_w4a8_requant_dot_route(k_shards):
    """At M>=2048, W4A8 routes through the per-channel int8 requant + one
    big int8 MXU dot (ops/config.use_w4a8_requant_dot). The requant adds a
    bounded per-channel int8 error on top of the int4 error; with the flag
    off, the exact K-chunked kernel path is restored."""
    from quanto_tpu.ops.pallas.qbits_mm import qbits_int8_matmul_kernel_call
    from quanto_tpu.tensor.optimizers import MaxOptimizer
    from quanto_tpu.tensor.qtype import qint4, qint8
    from quanto_tpu.tensor.weights import quantize_weight
    from quanto_tpu.tensor.activations import quantize_activation

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(256, 512), jnp.float32)
    x = jnp.asarray(rng.randn(2048, 512), jnp.float32)
    scale, shift = MaxOptimizer()(w, qint4, axis=0, group_size=128)
    qw = quantize_weight(w, qint4, 0, scale, shift=shift, group_size=128)
    tpu = WeightQBitsTpuArray.from_generic(qw, k_shards=k_shards)
    qx = quantize_activation(x, qint8, jnp.float32(np.abs(np.asarray(x)).max() / 127.0))
    ref = np.asarray(qx.dequantize() @ qw.dequantize().T)

    try:
        ops_config.set_backend(pallas_qbits=True, w4a8_requant_dot=True)
        out = qbits_int8_matmul_kernel_call(
            qx.data, qx.scale, tpu._packed, tpu._scale_t, tpu._shift_t,
            4, 128, jnp.float32, k_shards=k_shards, interpret=True,
        )
        assert out is not None
        out = np.asarray(out)
        # cosine vs the exact-dequant oracle: the int8 requant step is ~8x
        # finer than the coarsest group's int4 step, so correlation stays ~1.
        cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
        assert cos > 0.9995, cos
        # and per-element error bounded by the int8 step propagated through K
        err = np.abs(out - ref).max()
        amax = np.abs(np.asarray(qw.dequantize())).max()
        assert err < amax / 127.0 * np.abs(np.asarray(qx.dequantize())).sum(1).max() * 0.1

        # Flag off: exact kernel path (tight match, as the prefill oracle).
        ops_config.set_backend(pallas_qbits=True, w4a8_requant_dot=False)
        exact = qbits_int8_matmul_kernel_call(
            qx.data, qx.scale, tpu._packed, tpu._scale_t, tpu._shift_t,
            4, 128, jnp.float32, k_shards=k_shards, interpret=True,
        )
        assert exact is not None
        np.testing.assert_allclose(np.asarray(exact), ref, rtol=5e-4, atol=1e-4)
    finally:
        ops_config.set_backend()  # restore auto-detection for later tests
