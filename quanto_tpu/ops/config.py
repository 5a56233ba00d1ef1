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
}


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def set_backend(pallas_qbits: bool | None = None, pallas_qbytes: bool | None = None) -> None:
    """Force Pallas kernels on/off (None restores auto-detection)."""
    _STATE["pallas_qbits"] = pallas_qbits
    _STATE["pallas_qbytes"] = pallas_qbytes


def use_pallas_qbits() -> bool:
    if os.environ.get("QUANTO_TPU_DISABLE_PALLAS"):
        return False
    if _STATE["pallas_qbits"] is not None:
        return _STATE["pallas_qbits"]
    return _on_tpu()


def use_pallas_qbytes() -> bool:
    if os.environ.get("QUANTO_TPU_DISABLE_PALLAS"):
        return False
    if _STATE["pallas_qbytes"] is not None:
        return _STATE["pallas_qbytes"]
    return _on_tpu()


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU tests)."""
    return not _on_tpu()
