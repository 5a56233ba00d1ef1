"""8-bit mixed matmuls.

TPU-native equivalent of `quanto::qbytes_mm` and its per-backend impls
(reference `optimum/quanto/library/qbytes_mm.py:22-122`). On TPU the int8
path maps directly onto the MXU: `lax.dot_general` with int8 operands and
`preferred_element_type=int32` compiles to native int8 systolic matmuls
(the analogue of CUDA `torch._int_mm`). The weight-only path scales weights
back to float before the matmul; under jit XLA fuses the dequantization into
the matmul's operand read, so no separate kernel is needed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


__all__ = ["qbytes_mm", "qbytes_int_mm", "fp8_e4m3_to_float_bittrick"]

# fp8-weight dequant implementation: "convert" uses XLA's native
# f8e4m3->float convert; "bittrick" decodes the byte with integer VPU ops
# (exact for all non-NaN codes). Model-level A/B
# (bench/fp8_bittrick_ab_bench.py) showed bittrick LOSES in full programs
# (it displaces the convert-in-reduce fusion), so "convert" is the default.
# TRACE-TIME knob: jitted programs bake the value in at trace time; flipping
# it later does NOT affect already-compiled programs (retrace — e.g. a fresh
# make_decode_fn — to pick up a change).
FP8_DECODE = "convert"


def fp8_e4m3_to_float_bittrick(w: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Exact e4m3fn -> float decode with integer ops (no f8 convert).

    Places the 7 magnitude bits into the f32 exponent/mantissa fields with
    the exponent re-biased by +120 (so `2^(e-7) * (1+m/8)` comes out directly
    and no subnormal f32 intermediates appear — the TPU VPU flushes
    subnormals to zero), ORs the sign bit in, and fixes the 14 e4m3
    subnormal codes (`e==0`: true value `±m/8 * 2^-6`) with one select.
    Bit-exact against XLA's convert for all 254 non-NaN codes
    (tests/ops/test_fp8_decode.py). NaN codes (0x7F/0xFF) decode to a finite
    value — quantized weights never contain NaN.
    """
    b = lax.bitcast_convert_type(w, jnp.uint8).astype(jnp.uint32)
    mag = ((b & 0x7F) << 20) + (120 << 23)
    n = lax.bitcast_convert_type(mag | ((b & 0x80) << 24), jnp.float32)
    fix = n + n - jnp.where(n < 0, jnp.float32(-(2.0**-6)), jnp.float32(2.0**-6))
    return jnp.where((b & 0x78) == 0, fix, n).astype(out_dtype)


_FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e4m3fnuz, jnp.float8_e5m2)


def _is_fp8(dtype) -> bool:
    return any(dtype == d for d in _FP8_DTYPES)


def _dot_last_dim(a: jnp.ndarray, b_t: jnp.ndarray, preferred_element_type):
    """a[..., k] @ b_t[k, n] contraction over the last dim of a."""
    return lax.dot_general(
        a,
        b_t,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=preferred_element_type,
    )


def qbytes_int_mm(
    activations: jnp.ndarray, weights: jnp.ndarray, output_scales: jnp.ndarray
) -> jnp.ndarray:
    """int8 x int8 matmul with int32 accumulation on the MXU.

    `activations`: int8 [..., in], `weights`: int8 [out, in],
    `output_scales`: combined scale, broadcastable to [out, 1].
    Mirrors `qbytes_int_mm` (reference `library/qbytes_mm.py:36-50`):
    the int32 product is scaled in float32 to avoid overflow, then cast to
    the scale dtype.
    """
    out_data = _dot_last_dim(activations, weights.T, jnp.int32)
    output_scales = jnp.asarray(output_scales)
    # scales are per-out-feature [out, 1] (or scalar); transpose to broadcast
    # over the output's last dimension.
    scales = output_scales.T if output_scales.ndim == 2 else output_scales
    fp32_output = out_data.astype(jnp.float32) * scales.astype(jnp.float32)
    return fp32_output.astype(output_scales.dtype)


def qbytes_mm(
    activations: jnp.ndarray, weights: jnp.ndarray, output_scales: jnp.ndarray
) -> jnp.ndarray:
    """Generic mixed mm. When both operands are int8, routes to the native
    MXU int path (reference `library/qbytes_mm.py:25-33` default impl).

    Weight-only path: `dot(x, w.T.astype(f)) * scale.T` — the per-out-channel
    scale is applied to the OUTPUT. XLA fuses the int8/fp8 -> float convert
    into the matmul's operand read, so the weight streams from HBM at its
    quantized width (measured 661 GB/s on v5e vs 364 GB/s when materializing
    `w * scale` first — that materialized copy is what the reference's CUDA
    kernels avoid, and on TPU the fusion comes for free).
    """
    output_scales = jnp.asarray(output_scales)
    if activations.dtype == jnp.int8 and weights.dtype == jnp.int8:
        return qbytes_int_mm(activations, weights, output_scales)
    out_dtype = output_scales.dtype
    scales = output_scales.T if output_scales.ndim == 2 else output_scales
    if _is_fp8(activations.dtype) and _is_fp8(weights.dtype):
        from . import config

        if config.use_native_fp8_dot():
            # Wf8Af8 on the fp8 MXU datapath: both payloads stay fp8 through
            # the dot (generation-gated — see `config._FP8_DOT_GENERATIONS`;
            # the reference's fp8 kernel tier analogue,
            # `tensor/weights/marlin/fp8/qbits.py:28-51`).
            out = _dot_last_dim(activations, weights.T, jnp.float32)
            return (out * scales.astype(jnp.float32)).astype(out_dtype)
    activations = activations.astype(out_dtype)
    if weights.dtype == jnp.float8_e4m3fn and FP8_DECODE == "bittrick":
        weights = fp8_e4m3_to_float_bittrick(weights, out_dtype)
    out = _dot_last_dim(activations, weights.T.astype(out_dtype), jnp.float32)
    return (out * scales.astype(jnp.float32)).astype(out_dtype)
