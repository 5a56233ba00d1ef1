"""Generation-gated native-fp8 dot path (VERDICT round-1 item #4).

The reference ships a dedicated fp8 kernel tier for capable GPUs
(`tensor/weights/marlin/fp8/qbits.py:28-51` gated on sm>=8.0); the TPU
analogue is `lax.dot_general` with fp8 operand types, gated on the TPU
generation (`ops/config.py:_FP8_DOT_GENERATIONS`) because v5e has no fp8
datapath (measured slower than the convert-fused path, RESULTS.md).

These tests check the gate logic and that the native path's numerics match
the convert path exactly (on CPU XLA both decode the same fp8 values).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import quanto_tpu as qt
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.qbytes_mm import qbytes_mm


@pytest.fixture
def fp8_operands():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 256), jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(128, 256) * 0.1, jnp.float8_e4m3fn)
    scales = jnp.asarray(rng.rand(128, 1) * 0.01 + 0.001, jnp.float32)
    return x, w, scales


def test_generation_gate_defaults(monkeypatch):
    monkeypatch.delenv("QUANTO_TPU_FP8_DOT", raising=False)
    # Off-TPU (these tests run on CPU): no generation -> gate off.
    assert ops_config.tpu_generation() is None
    assert ops_config.use_native_fp8_dot() is False
    # Table entries: v5e off (measured), v6e/v5p on (deferred validation).
    assert ops_config._FP8_DOT_GENERATIONS["v5e"] is False
    assert ops_config._FP8_DOT_GENERATIONS["v6e"] is True
    assert ops_config._FP8_DOT_GENERATIONS["v5p"] is True


def test_generation_gate_overrides(monkeypatch):
    monkeypatch.setenv("QUANTO_TPU_FP8_DOT", "1")
    assert ops_config.use_native_fp8_dot() is True
    monkeypatch.setenv("QUANTO_TPU_FP8_DOT", "0")
    assert ops_config.use_native_fp8_dot() is False
    monkeypatch.delenv("QUANTO_TPU_FP8_DOT")
    ops_config.set_backend(fp8_dot=True)
    try:
        assert ops_config.use_native_fp8_dot() is True
    finally:
        ops_config.set_backend()
    assert ops_config.use_native_fp8_dot() is False


def test_native_fp8_dot_matches_convert_path(fp8_operands):
    x, w, scales = fp8_operands
    ref = qbytes_mm(x, w, scales)  # convert path (gate off on CPU)
    ops_config.set_backend(fp8_dot=True)
    try:
        out = qbytes_mm(x, w, scales)
    finally:
        ops_config.set_backend()
    # Same fp8 values decoded either way: results agree to f32 rounding.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1e-6, atol=1e-6
    )


def test_native_fp8_dot_e5m2(fp8_operands):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 128), jnp.float8_e5m2)
    w = jnp.asarray(rng.randn(64, 128) * 0.1, jnp.float8_e5m2)
    scales = jnp.asarray(rng.rand(64, 1) * 0.01, jnp.float32)
    ref = qbytes_mm(x, w, scales)
    ops_config.set_backend(fp8_dot=True)
    try:
        out = qbytes_mm(x, w, scales)
    finally:
        ops_config.set_backend()
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=1e-6, atol=1e-6
    )


def test_wf8af8_qlinear_end_to_end():
    """Full Wf8Af8 qlinear through the native path == dequant oracle."""
    from quanto_tpu.tensor.activations import quantize_activation
    from quanto_tpu.tensor.qtype import qfloat8

    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(128, 256), jnp.float32)
    x = jnp.asarray(rng.randn(4, 256), jnp.float32)
    scale = qt.AbsmaxOptimizer()(w, qfloat8, axis=0)
    qw = qt.quantize_weight(w, qfloat8, 0, scale, activation_qtype=qfloat8)
    qx = quantize_activation(x, qfloat8, jnp.float32(np.abs(np.asarray(x)).max() / 448.0))
    oracle = qx.dequantize() @ qw.dequantize().T
    ops_config.set_backend(fp8_dot=True)
    try:
        out = qt.qlinear(qx, qw)
    finally:
        ops_config.set_backend()
    o, r = np.asarray(out, np.float32), np.asarray(oracle, np.float32)
    cos = (o * r).sum() / (np.linalg.norm(o) * np.linalg.norm(r) + 1e-12)
    assert cos > 1 - 1e-5, cos
