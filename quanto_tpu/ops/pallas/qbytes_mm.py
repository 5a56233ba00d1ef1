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


__all__ = ["qbytes_matmul_kernel_call"]


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
