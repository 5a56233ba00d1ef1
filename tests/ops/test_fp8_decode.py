"""fp8 e4m3 integer-decode bit-trick vs XLA's native convert."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from importlib import import_module

qbm = import_module("quanto_tpu.ops.qbytes_mm")  # package attr shadows the submodule


def test_bittrick_exact_all_codes():
    """Every non-NaN e4m3fn code decodes bit-identically to XLA's convert,
    including the 14 subnormal codes and both zeros."""
    all_bytes = jnp.arange(256, dtype=jnp.uint8)
    all_f8 = lax.bitcast_convert_type(all_bytes, jnp.float8_e4m3fn)
    ref = np.asarray(all_f8.astype(jnp.float32))
    got = np.asarray(qbm.fp8_e4m3_to_float_bittrick(all_f8, jnp.float32))
    non_nan = ~np.isnan(ref)
    assert non_nan.sum() == 254
    np.testing.assert_array_equal(got[non_nan], ref[non_nan])
    # -0.0 decodes to +0.0 (the subnormal fixup's add rounds -x + x to +0);
    # value-equal, and the sign of zero cannot affect a matmul.
    assert got[128] == 0.0 and got[0] == 0.0


def test_bittrick_bf16_output():
    all_bytes = jnp.arange(256, dtype=jnp.uint8)
    all_f8 = lax.bitcast_convert_type(all_bytes, jnp.float8_e4m3fn)
    ref = np.asarray(all_f8.astype(jnp.bfloat16).astype(np.float32))
    got = np.asarray(qbm.fp8_e4m3_to_float_bittrick(all_f8, jnp.bfloat16).astype(np.float32))
    non_nan = ~np.isnan(ref)
    np.testing.assert_array_equal(got[non_nan], ref[non_nan])


def test_qbytes_mm_bittrick_mode_matches_convert():
    key_w = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    w = jnp.asarray(key_w / 8.0).astype(jnp.float8_e4m3fn)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.bfloat16)
    scales = jnp.asarray(np.abs(np.random.RandomState(2).randn(64, 1)) / 4, jnp.bfloat16)
    ref = qbm.qbytes_mm(x, w, scales)
    old = qbm.FP8_DECODE
    try:
        qbm.FP8_DECODE = "bittrick"
        got = qbm.qbytes_mm(x, w, scales)
    finally:
        qbm.FP8_DECODE = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
