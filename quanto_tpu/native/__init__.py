"""Native (C++) runtime helpers, loaded via ctypes.

The analogue of the reference's extension loader
(`optimum/quanto/library/extensions/extension.py:13-54`): the shared library
is built lazily on first use (g++, cached next to the source keyed on mtime),
and every entry point has a pure-Python fallback so the package works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np


_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "quanto_native.cpp")
_LIB_PATH = os.path.join(_HERE, "_quanto_native.so")
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        warnings.warn(f"quanto_tpu native build failed, using Python fallbacks: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call (None if unavailable)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    fresh = os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    if not fresh and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        warnings.warn(f"quanto_tpu native load failed: {e}")
        _load_failed = True
        return None
    lib.qt_mmap_open.restype = ctypes.c_void_p
    lib.qt_mmap_open.argtypes = [ctypes.c_char_p]
    lib.qt_mmap_size.restype = ctypes.c_uint64
    lib.qt_mmap_size.argtypes = [ctypes.c_void_p]
    lib.qt_mmap_ptr.restype = ctypes.c_void_p
    lib.qt_mmap_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.qt_mmap_close.argtypes = [ctypes.c_void_p]
    lib.qt_repack_grouped_to_splithalf.restype = ctypes.c_int
    lib.qt_repack_grouped_to_splithalf.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.qt_unpack.restype = ctypes.c_int
    lib.qt_unpack.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return get_lib() is not None


class MappedFile:
    """mmap'd read-only file with zero-copy numpy views (native data-loader)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.qt_mmap_open(path.encode())
        if not self._handle:
            raise OSError(f"mmap failed for {path}")
        self.size = lib.qt_mmap_size(self._handle)

    def view(self, offset: int, nbytes: int, dtype=np.uint8) -> np.ndarray:
        ptr = self._lib.qt_mmap_ptr(self._handle, offset, nbytes)
        if not ptr:
            raise ValueError("out-of-bounds tensor slice")
        buf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        return np.frombuffer(buf, dtype=np.uint8).view(dtype)

    def close(self):
        if self._handle:
            self._lib.qt_mmap_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def repack_grouped_to_splithalf(
    packed_in: np.ndarray, n: int, k: int, group_size: Optional[int], bits: int
) -> Optional[np.ndarray]:
    """Serialized grouped layout -> TPU split-half layout in one native pass.

    Returns None when the native library is unavailable (caller uses the
    jnp fallback: unpack + ungroup + pack_split_half).
    """
    lib = get_lib()
    if lib is None:
        return None
    gs = group_size if group_size is not None else k
    src = np.ascontiguousarray(packed_in, dtype=np.uint8)
    out = np.empty((n, k * bits // 8), dtype=np.uint8)
    rc = lib.qt_repack_grouped_to_splithalf(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        n, k, gs, bits,
    )
    if rc != 0:
        return None
    return out
