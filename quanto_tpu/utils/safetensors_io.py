"""Minimal safetensors reader/writer.

The stock `safetensors.numpy`/`safetensors.flax` loaders fail on fp8 tensors
with older numpy (no `np.float8_e4m3fn`). Quantized checkpoints are mostly
int8/uint8/fp8 payloads, so we implement the (very simple) safetensors format
directly: an 8-byte little-endian header length, a JSON header mapping tensor
names to `{dtype, shape, data_offsets}`, then the raw tensor bytes. This gives
byte-level interop with checkpoints written by the reference implementation
(which serializes via safetensors, `optimum/quanto/models/transformers_models.py:165-179`).
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional

import jax.numpy as jnp
import ml_dtypes
import numpy as np


__all__ = ["save_file", "load_file", "safe_open_header"]


# safetensors dtype tag <-> numpy dtype (ml_dtypes supplies bf16/fp8).
_ST_TO_NP = {
    "BOOL": np.dtype(np.bool_),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "I16": np.dtype(np.int16),
    "U16": np.dtype(np.uint16),
    "I32": np.dtype(np.int32),
    "U32": np.dtype(np.uint32),
    "I64": np.dtype(np.int64),
    "U64": np.dtype(np.uint64),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F32": np.dtype(np.float32),
    "F64": np.dtype(np.float64),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
}
_NP_TO_ST = {v: k for k, v in _ST_TO_NP.items()}
# fnuz maps onto the same storage byte width; tag it E4M3 like torch does.
_NP_TO_ST[np.dtype(ml_dtypes.float8_e4m3fnuz)] = "F8_E4M3"


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return np.asarray(jnp.asarray(t))


def save_file(tensors: Dict[str, "np.ndarray | jnp.ndarray"], path: str, metadata: Optional[Dict[str, str]] = None) -> None:
    header: Dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    blobs = []
    offset = 0
    for name, t in tensors.items():
        a = np.ascontiguousarray(_to_numpy(t))
        st_dtype = _NP_TO_ST.get(a.dtype)
        if st_dtype is None:
            raise ValueError(f"Unsupported dtype for safetensors: {a.dtype} (tensor {name!r})")
        nbytes = a.nbytes
        header[name] = {
            "dtype": st_dtype,
            "shape": list(a.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(a.tobytes())
        offset += nbytes
    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # Pad the header to an 8-byte boundary like the rust implementation.
    pad = (-len(header_bytes)) % 8
    header_bytes += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for blob in blobs:
            f.write(blob)


def safe_open_header(path: str) -> Dict[str, dict]:
    """Return the parsed JSON header (tensor name -> {dtype, shape, data_offsets})."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(header_len).decode("utf-8"))


def load_file(path: str, device=None) -> Dict[str, jnp.ndarray]:
    """Load every tensor in a safetensors file as jnp arrays.

    Uses the native mmap loader when available (zero-copy page-cache views,
    `quanto_tpu/native/quanto_native.cpp` — the analogue of the reference's
    Rust safetensors backend); falls back to a plain read.
    """
    mf = _try_mmap(path)
    if mf is not None:
        (header_len,) = struct.unpack("<Q", bytes(mf.view(0, 8)))
        header = json.loads(bytes(mf.view(8, header_len)).decode("utf-8"))
        base = 8 + header_len
        out: Dict[str, jnp.ndarray] = {}
        for name, info in header.items():
            if name == "__metadata__":
                continue
            np_dtype = _ST_TO_NP[info["dtype"]]
            start, end = info["data_offsets"]
            a = mf.view(base + start, end - start, np_dtype).reshape(info["shape"])
            # copy=True: jnp.asarray may zero-copy CPU buffers, which would
            # dangle once the mapping is closed.
            arr = jnp.array(a, copy=True)
            if device is not None:
                arr = jnp.device_put(arr, device)
            out[name] = arr
        mf.close()
        return out
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf-8"))
        data = f.read()
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        np_dtype = _ST_TO_NP[info["dtype"]]
        start, end = info["data_offsets"]
        a = np.frombuffer(data[start:end], dtype=np_dtype).reshape(info["shape"])
        arr = jnp.asarray(a)
        if device is not None:
            arr = jnp.device_put(arr, device)
        out[name] = arr
    return out


def _try_mmap(path: str):
    try:
        from ..native import MappedFile, is_available

        if is_available():
            return MappedFile(path)
    except Exception:
        pass
    return None


class LazySafetensors:
    """Lazy per-tensor access over one or many safetensors shards.

    Analogue of the reference `ShardedStateDict`
    (`optimum/quanto/models/shared_dict.py:22-53`): tensors are read from disk
    on demand so that loading a large sharded checkpoint never materializes
    the full file set in host memory.
    """

    def __init__(self, paths: Dict[str, str]):
        # paths: tensor name -> file path
        self._paths = paths
        self._headers: Dict[str, Dict[str, dict]] = {}
        self._mmaps: Dict[str, object] = {}

    @classmethod
    def from_files(cls, files) -> "LazySafetensors":
        paths: Dict[str, str] = {}
        for fp in files:
            for name in safe_open_header(fp):
                if name != "__metadata__":
                    paths[name] = fp
        return cls(paths)

    def keys(self):
        return self._paths.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._paths

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, name: str) -> jnp.ndarray:
        fp = self._paths[name]
        if fp not in self._headers:
            self._headers[fp] = safe_open_header(fp)
        info = self._headers[fp][name]
        np_dtype = _ST_TO_NP[info["dtype"]]
        start, end = info["data_offsets"]
        mf = self._mmaps.get(fp)
        if mf is None and fp not in self._mmaps:
            mf = _try_mmap(fp)
            self._mmaps[fp] = mf
        if mf is not None:
            with open(fp, "rb") as f:
                (header_len,) = struct.unpack("<Q", f.read(8))
            a = mf.view(8 + header_len + start, end - start, np_dtype)
            return jnp.array(a.reshape(info["shape"]), copy=True)
        with open(fp, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            f.seek(8 + header_len + start)
            raw = f.read(end - start)
        return jnp.asarray(np.frombuffer(raw, dtype=np_dtype).reshape(info["shape"]))


_SIZE_UNITS = {"KB": 2**10, "MB": 2**20, "GB": 2**30, "TB": 2**40}


def _parse_size(size) -> int:
    if isinstance(size, int):
        return size
    s = str(size).strip().upper()
    for unit, mult in _SIZE_UNITS.items():
        if s.endswith(unit):
            return int(float(s[: -len(unit)]) * mult)
    return int(s)


def save_sharded(
    tensors: Dict[str, "np.ndarray | jnp.ndarray"],
    directory: str,
    max_shard_size="5GB",
    base_name: str = "model",
) -> None:
    """Write `tensors` as a single safetensors file, or — above
    `max_shard_size` — as transformers-convention shards
    (`model-00001-of-0000N.safetensors` + `model.safetensors.index.json`).
    The reference reads such checkpoints through its lazy `ShardedStateDict`
    (`optimum/quanto/models/shared_dict.py:22-53`); ours through
    `LazySafetensors.from_files`. Stale artifacts of the other form are
    removed so a directory never holds both."""
    import os

    import re

    limit = _parse_size(max_shard_size)
    single_path = os.path.join(directory, f"{base_name}.safetensors")
    index_path = single_path + ".index.json"
    shard_re = re.compile(rf"^{re.escape(base_name)}-\d{{5}}-of-\d{{5}}\.safetensors$")

    def _remove_stale_shards(keep=()):
        for name in os.listdir(directory):
            if shard_re.match(name) and name not in keep:
                os.remove(os.path.join(directory, name))

    sizes = {name: _to_numpy(t).nbytes for name, t in tensors.items()}
    if sum(sizes.values()) <= limit:
        save_file(tensors, single_path)
        if os.path.exists(index_path):
            os.remove(index_path)
        _remove_stale_shards()
        return
    shards = [[]]
    shard_bytes = 0
    for name in tensors:
        if shards[-1] and shard_bytes + sizes[name] > limit:
            shards.append([])
            shard_bytes = 0
        shards[-1].append(name)
        shard_bytes += sizes[name]
    n = len(shards)
    weight_map = {}
    for i, names in enumerate(shards, start=1):
        fname = f"{base_name}-{i:05d}-of-{n:05d}.safetensors"
        save_file({k: tensors[k] for k in names}, os.path.join(directory, fname))
        for k in names:
            weight_map[k] = fname
    with open(index_path, "w") as f:
        json.dump(
            {
                "metadata": {"total_size": sum(sizes.values())},
                "weight_map": weight_map,
            },
            f,
            indent=2,
        )
    if os.path.exists(single_path):
        os.remove(single_path)
    _remove_stale_shards(keep=set(weight_map.values()))
