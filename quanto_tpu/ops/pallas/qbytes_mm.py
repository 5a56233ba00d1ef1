"""Pallas TPU kernel: fused int8/fp8 weight-only matmul.

TPU-native replacement for the reference CUDA weight-only paths
(`optimum/quanto/library/qbytes_mm.py:66-122`, marlin fp8 GEMM): the int8
payload streams HBM->VMEM at full bandwidth and is converted to bf16
*in VMEM* right before the MXU — the dequantized weight copy that the XLA
fallback materializes (weights * scale in HBM) never exists. The per-output-
channel scale is applied to the [M, BN] output tile (O(M*N) work instead of
O(N*K)).

Layout: x [M, K] float, w [N, K] int8 (torch convention), scale [N, 1].
Grid tiles N; K is kept whole per tile (decode matmuls have K <= 16k, so a
[BN, K] int8 tile fits VMEM with room for double buffering).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["qbytes_matmul_kernel_call", "qbytes_fp8_matmul_kernel_call"]


def _kernel(x_ref, w_ref, scale_ref, out_ref, *, compute_dtype):
    # x: [M, K] compute dtype; w: [BN, K] int8/fp8; scale: [BN, 1] float.
    w = w_ref[:].astype(compute_dtype)
    y = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, BN]
    scale = scale_ref[:].astype(jnp.float32)  # [BN, 1]
    out_ref[:] = y * scale.T


def _pick_bn(n: int, k: int, itemsize: int = 1, vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest N-tile (multiple of 128 dividing n) whose [BN, K] tile fits the
    VMEM budget with double buffering."""
    limit = max(vmem_budget // (2 * k * itemsize), 128)
    bn = 128
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= limit and n % cand == 0:
            bn = cand
            break
    return bn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(x, w, scale, *, interpret=False):
    M, K = x.shape
    N = w.shape[0]
    compute_dtype = x.dtype
    bn = _pick_bn(N, K)
    grid = (N // bn,)
    kernel = functools.partial(_kernel, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + M * K * x.dtype.itemsize + M * N * 4,
            transcendentals=0,
        ),
    )(x, w, scale)
    return out


def _fp8_decode_e4m3(bits_i32, compute_dtype):
    """Vectorized e4m3fn -> float decode from raw byte values (0..255).

    Mosaic v5e has no fp8 vector casts (RESULTS.md), so the XLA fp8 path
    pays a slow per-element convert inside its matmul emitter. Here the
    byte is decomposed with integer ops and the value composed exactly as
    mantissa * 2^exponent, where the power of two is built by bitcasting a
    shifted biased exponent into f32:

        normal (e>0):   (8+m) * 2^(e-10)  ==  (1+m/8) * 2^(e-7)
        subnormal (e=0):   m  * 2^(1-10)  ==  (m/8)   * 2^-6

    NaN codes (e=15, m=7) decode to +-480 — weights produced by the
    quantizer never contain NaN.
    """
    sign = bits_i32 >> 7
    e = (bits_i32 >> 3) & 0xF
    m = bits_i32 & 0x7
    mt = jnp.where(e > 0, m + 8, m)
    exp_biased = jnp.where(e > 0, e, 1) + (127 - 10)
    pow2 = jax.lax.bitcast_convert_type(exp_biased << 23, jnp.float32)
    mag = mt.astype(jnp.float32) * pow2
    return jnp.where(sign > 0, -mag, mag).astype(compute_dtype)


def _fp8_kernel(x_ref, w_ref, scale_ref, out_ref, *, compute_dtype):
    # x: [M, K] compute dtype; w: [BN, K] uint8 (e4m3fn bits); scale: [BN, 1].
    w = _fp8_decode_e4m3(w_ref[:].astype(jnp.int32), compute_dtype)
    y = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = y * scale_ref[:].astype(jnp.float32).T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fp8_call(x, w_bits, scale, *, interpret=False):
    M, K = x.shape
    N = w_bits.shape[0]
    bn = _pick_bn(N, K)
    kernel = functools.partial(_fp8_kernel, compute_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + M * K * x.dtype.itemsize + M * N * 4,
            transcendentals=0,
        ),
    )(x, w_bits, scale)


def qbytes_fp8_matmul_kernel_call(
    x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray, *, interpret: bool = False
) -> Optional[jnp.ndarray]:
    """Fused fp8-e4m3fn weight-only matmul with in-kernel integer decode.

    Same contract/gating as `qbytes_matmul_kernel_call`; `w` is an
    e4m3fn array [N, K] (bitcast to uint8 outside the kernel — free in XLA).
    Returns None when gating fails.
    """
    if w.ndim != 2 or scale.ndim != 2 or scale.shape != (w.shape[0], 1):
        return None
    if w.dtype != jnp.float8_e4m3fn:
        return None
    N, K = w.shape
    if N % 128 != 0 or K % 128 != 0:
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if M > 256:
        return None
    x2 = x.reshape(M, K)
    m_pad = -M % 8
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    w_bits = jax.lax.bitcast_convert_type(w, jnp.uint8)
    out = _fp8_call(x2, w_bits, scale, interpret=interpret)
    if m_pad:
        out = out[:M]
    return out.reshape(*lead, N).astype(x.dtype)


def qbytes_matmul_kernel_call(
    x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray, *, interpret: bool = False
) -> Optional[jnp.ndarray]:
    """y[..., N] = x[..., K] @ (w[N, K] * scale[N, 1]).T via the fused kernel.

    Returns None when shapes/dtypes don't meet the kernel's constraints
    (caller falls back to the XLA path) — the analogue of the reference's
    kernel-selection gating (`tensor/weights/qbytes.py:120-143`).
    """
    if w.ndim != 2 or scale.ndim != 2 or scale.shape != (w.shape[0], 1):
        return None
    N, K = w.shape
    if N % 128 != 0 or K % 128 != 0:
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if M > 256:
        # Decode kernel (whole x kept in VMEM); prefill uses the XLA path.
        return None
    x2 = x.reshape(M, K)
    # Pad tiny decode batches up to one sublane tile.
    m_pad = -M % 8
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _call(x2, w, scale, interpret=interpret)
    if m_pad:
        out = out[:M]
    return out.reshape(*lead, N).astype(x.dtype)
