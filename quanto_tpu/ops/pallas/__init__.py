"""Pallas TPU kernels (MXU-tiled fused dequant matmuls).

TPU-native replacement for the reference CUDA/Metal/SYCL extensions
(`optimum/quanto/library/extensions/`). Kernels return None when the operand
shapes/dtypes don't meet their alignment constraints, in which case callers
fall back to the XLA path — the analogue of the reference's kernel-selection
constraints in `WeightQBitsTensor.create()` (`weights/qbits.py:94-138`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def qbits_matmul(x: jnp.ndarray, w) -> Optional[jnp.ndarray]:
    """Fused sub-byte dequant matmul. Placeholder: XLA fallback until the
    Pallas kernel lands (see ops/pallas/qbits_mm.py)."""
    return None
