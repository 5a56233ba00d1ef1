"""Hub-shaped model resolution (reference `ModelHubMixin` surface).

The torch reference's `QuantizedTransformersModel` is a `ModelHubMixin`:
`from_pretrained` accepts Hugging Face Hub ids and resolves them with
`snapshot_download` (`optimum/quanto/models/transformers_models.py:20,127`).
This module provides the same surface for the TPU build with a PLUGGABLE
resolver chain, so hub-id-shaped names work in real deployments while
offline environments (like CI or air-gapped pods) get a clean error or a
local-cache hit instead of a hang:

1. a user-registered resolver (`set_hub_resolver`),
2. the standard Hugging Face cache layout on disk
   (``<cache>/models--org--name/snapshots/<revision>``) — pre-downloaded
   models work with zero network,
3. `huggingface_hub.snapshot_download` when the library is importable and
   `QUANTO_TPU_OFFLINE`/`HF_HUB_OFFLINE` is not set.
"""

from __future__ import annotations

import os
from typing import Callable, Optional


__all__ = ["resolve_model_path", "set_hub_resolver", "is_hub_id"]


_RESOLVER: Optional[Callable[..., str]] = None


def set_hub_resolver(fn: Optional[Callable[..., str]]) -> None:
    """Register a custom resolver `fn(model_id, revision=None) -> local_dir`
    (None restores the default chain)."""
    global _RESOLVER
    _RESOLVER = fn


def is_hub_id(name_or_path: str) -> bool:
    """Hub-id-shaped: 'org/name' (one slash, no path separators beyond it,
    not an existing local path)."""
    if os.path.exists(name_or_path):
        return False
    if name_or_path.startswith((".", "/", "~")):
        return False
    parts = name_or_path.split("/")
    return len(parts) == 2 and all(p for p in parts)


def _offline() -> bool:
    for var in ("QUANTO_TPU_OFFLINE", "HF_HUB_OFFLINE", "TRANSFORMERS_OFFLINE"):
        if os.environ.get(var, "").lower() in ("1", "true", "yes", "on"):
            return True
    return False


def _hf_cache_dirs(cache_dir: Optional[str]):
    if cache_dir:
        yield cache_dir
    env = os.environ.get("QUANTO_TPU_HF_CACHE") or os.environ.get("HF_HUB_CACHE")
    if env:
        yield env
    hf_home = os.environ.get("HF_HOME")
    if hf_home:
        yield os.path.join(hf_home, "hub")
    yield os.path.expanduser("~/.cache/huggingface/hub")


def _snapshot_complete(path: str) -> bool:
    """Heuristic completeness check so an interrupted download does not
    shadow a working snapshot_download resume forever: a usable model
    snapshot has a config.json and at least one weights file."""
    if not os.path.isdir(path):
        return False
    try:
        names = os.listdir(path)
    except OSError:
        return False
    has_config = "config.json" in names
    has_weights = any(n.endswith(".safetensors") for n in names)
    return has_config and has_weights


def _lookup_cache(model_id: str, revision: Optional[str], cache_dir: Optional[str]):
    """Standard HF cache layout: models--{org}--{name}/snapshots/{commit}."""
    folder = "models--" + model_id.replace("/", "--")
    for root in _hf_cache_dirs(cache_dir):
        snap_root = os.path.join(root, folder, "snapshots")
        if not os.path.isdir(snap_root):
            continue
        if revision:
            # revision may be a tag/branch (refs/) or a commit prefix.
            ref_path = os.path.join(root, folder, "refs", revision)
            if os.path.exists(ref_path):
                with open(ref_path) as f:
                    commit = f.read().strip()
                cand = os.path.join(snap_root, commit)
                if _snapshot_complete(cand):
                    return cand
            for snap in sorted(os.listdir(snap_root)):
                if snap.startswith(revision) and _snapshot_complete(
                    os.path.join(snap_root, snap)
                ):
                    return os.path.join(snap_root, snap)
            continue
        # No revision requested: resolve like huggingface_hub does — follow
        # the default-branch pointer refs/main first, so a stale or
        # non-default-branch snapshot that happens to be newer on disk never
        # shadows the default revision. Fall back to newest-complete only
        # when refs/main is absent or its snapshot is incomplete.
        ref_main = os.path.join(root, folder, "refs", "main")
        if os.path.exists(ref_main):
            try:
                with open(ref_main) as f:
                    commit = f.read().strip()
            except OSError:
                commit = ""
            cand = os.path.join(snap_root, commit)
            if commit and _snapshot_complete(cand):
                return cand
        snaps = sorted(
            (os.path.join(snap_root, s) for s in os.listdir(snap_root)),
            key=os.path.getmtime,
            reverse=True,
        )
        for snap in snaps:
            if _snapshot_complete(snap):
                return snap
    return None


def resolve_model_path(
    name_or_path: str,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """Resolve a local directory or hub id to a local checkpoint directory."""
    if os.path.isdir(name_or_path):
        return name_or_path
    if not is_hub_id(name_or_path):
        raise FileNotFoundError(
            f"Model path '{name_or_path}' is neither a local directory nor a "
            "hub-id-shaped name (org/name)."
        )
    if _RESOLVER is not None:
        return _RESOLVER(name_or_path, revision=revision)
    cached = _lookup_cache(name_or_path, revision, cache_dir)
    if cached is not None:
        return cached
    if _offline():
        raise FileNotFoundError(
            f"'{name_or_path}' is not in the local Hugging Face cache and this "
            "environment is offline (QUANTO_TPU_OFFLINE/HF_HUB_OFFLINE set). "
            "Pre-download the model or register a resolver with "
            "quanto_tpu.models.hub.set_hub_resolver."
        )
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise FileNotFoundError(
            f"'{name_or_path}' is not a local directory and huggingface_hub is "
            "not installed to download it. Pre-download the model or register "
            "a resolver with quanto_tpu.models.hub.set_hub_resolver."
        ) from e
    try:
        return snapshot_download(
            name_or_path,
            revision=revision,
            cache_dir=cache_dir,
            allow_patterns=["*.json", "*.safetensors", "*.model", "*.txt"],
        )
    except Exception as e:
        raise FileNotFoundError(
            f"Could not download '{name_or_path}' from the Hugging Face Hub "
            f"({type(e).__name__}: {e}). If this environment has no network "
            "access, pre-populate the cache or register a resolver with "
            "quanto_tpu.models.hub.set_hub_resolver."
        ) from e
