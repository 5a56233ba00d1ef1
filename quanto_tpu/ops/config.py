"""Kernel backend selection.

TPU analogue of the reference's extension registry & platform gating
(`optimum/quanto/library/extensions/__init__.py:20-44`): instead of compiled
per-device extensions, we switch between pure-XLA paths (always available)
and Pallas kernels (TPU, or CPU interpret mode for tests).
"""

from __future__ import annotations

import os

import jax


_STATE = {
    "pallas_qbits": None,  # None = auto
    "pallas_qbytes": None,
    "flash_decode": None,
}


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mesh_active() -> bool:
    """True inside a `with Mesh(...)` context (sharded execution)."""
    try:
        from jax.interpreters import pxla

        return not pxla.thread_resources.env.physical_mesh.empty
    except Exception:
        return False


_mesh_active = mesh_active  # back-compat alias


def _single_device_ok() -> bool:
    """Pallas kernels without a partitioning rule run on a single device, or
    on multi-device hosts as long as no Mesh context is active (unsharded
    arrays run on one device; under a mesh XLA would have to all-gather the
    kernel operands). The qbits matmul no longer needs this gate — its
    custom_partitioning wrapper (`ops/pallas/qbits_mm_sharded.py`) gives it
    per-shard lowering under a mesh."""
    return jax.device_count() == 1 or not mesh_active()


def set_backend(
    pallas_qbits: bool | None = None,
    pallas_qbytes: bool | None = None,
    flash_decode: bool | None = None,
) -> None:
    """Force Pallas kernels on/off (None restores auto-detection)."""
    _STATE["pallas_qbits"] = pallas_qbits
    _STATE["pallas_qbytes"] = pallas_qbytes
    _STATE["flash_decode"] = flash_decode


def use_pallas_qbits() -> bool:
    if os.environ.get("QUANTO_TPU_DISABLE_PALLAS"):
        return False
    if _STATE["pallas_qbits"] is not None:
        return _STATE["pallas_qbits"]
    # Mesh-safe: under an active Mesh the qlinear dispatch routes through the
    # custom_partitioning wrapper instead of the raw pallas_call.
    return _on_tpu()


def use_pallas_qbytes() -> bool:
    if os.environ.get("QUANTO_TPU_DISABLE_PALLAS"):
        return False
    if _STATE["pallas_qbytes"] is not None:
        return _STATE["pallas_qbytes"]
    return _on_tpu() and _single_device_ok()


def use_flash_decode() -> bool:
    """Fused Pallas decode attention — currently OPT-IN
    (`set_backend(flash_decode=True)` or QUANTO_TPU_FLASH_DECODE=1).

    The kernel is numerically verified but a ~5%-of-HBM-bandwidth Pallas
    block-streaming floor (RESULTS.md ablations) makes it tie/lose to the
    XLA einsum path on v5e; auto stays off until that is resolved. Not
    XLA-partitionable: sharded meshes need shard_map to use it.
    """
    if os.environ.get("QUANTO_TPU_DISABLE_PALLAS"):
        return False
    if _STATE["flash_decode"] is not None:
        return _STATE["flash_decode"]
    if os.environ.get("QUANTO_TPU_FLASH_DECODE", "").lower() in ("1", "true", "yes", "on"):
        return _on_tpu() and _single_device_ok()
    return False


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU tests)."""
    return not _on_tpu()
