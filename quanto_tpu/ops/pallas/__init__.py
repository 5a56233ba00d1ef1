"""Pallas TPU kernels (MXU-tiled fused dequant matmuls).

TPU-native replacement for the reference CUDA/Metal/SYCL extensions
(`optimum/quanto/library/extensions/`). Kernel-call wrappers return None when
operand shapes/dtypes don't meet their constraints, and callers fall back to
the XLA path — the analogue of the reference's kernel-selection constraints
in `WeightQBitsTensor.create()` (`weights/qbits.py:94-138`).
"""

from .qbits_mm import pack_split_half, qbits_matmul_kernel_call, unpack_split_half
from .qbytes_mm import qbytes_matmul_kernel_call
