"""Shared sliding-window ring-cache helpers for alternating-attention
families (GPT-OSS window 128, Gemma2 window 4096, Gemma3 5:1 pattern at
window 1024).

A sliding layer only attends to the last W positions; the ring layout
stores exactly W slots (writes at pos % W) instead of max_len, cutting the
layer's KV payload and attention reads by max_len/W. Exactness and the
read-then-write rationale live in `tensor/kv_cache.py` (ring notes); this
module holds the model-side plumbing the families share:

- `use_ring(config, cache)`        — is this cache ring-layout?
- `layer_cache_len(config, i, max_len, sliding_ring)` — per-layer capacity
- `ring_mask(positions, q_pos, cache_pos, w, B, neg)` — [B,1,T,W+T] mask
- `ring_attention_inputs(...)`     — read-concat-write around attention
- `write_valid_mask(write_len, T)` — pad/garbage column mask for engine
  fixed-shape chunks
"""

from __future__ import annotations

import jax.numpy as jnp


def use_ring(config, cache) -> bool:
    """True when the sliding layers' caches are exactly W slots — the ring
    layout `init_kv_cache` builds. Independent of whether full layers
    exist (an all-sliding config still rings); a uniform cache that
    HAPPENS to be W slots is also treated as a ring, which is strictly
    more correct (the flat path would clamp writes past W). Paged caches
    are uniform — never ring."""
    from ..tensor.kv_cache import cache_max_len
    from ..tensor.paged_kv import PagedKVLayer

    w = getattr(config, "sliding_window", None)
    if cache is None or w is None:
        return False
    sl = [i for i, t in enumerate(config.layer_types) if t == "sliding_attention"]
    if not sl or isinstance(cache[sl[0]], PagedKVLayer):
        return False
    return cache_max_len(cache[sl[0]]) == w


def layer_cache_len(config, i: int, max_len: int, sliding_ring: bool) -> int:
    """Capacity of layer i's cache: W for ring sliding layers, max_len
    otherwise (ring only engages when max_len > W)."""
    w = getattr(config, "sliding_window", None)
    ring = sliding_ring and w is not None and max_len > w
    if ring and config.layer_types[i] == "sliding_attention":
        return w
    return max_len


def ring_mask(positions, q_pos, cache_pos, w: int, B: int, neg) -> jnp.ndarray:
    """Sliding mask over [W ring slots | T in-chunk keys] tagged with
    ABSOLUTE positions (never-written slots < 0). `positions` [B, T] are
    the chunk's absolute positions; `q_pos` [B, 1, T, 1]."""
    from ..tensor.kv_cache import ring_key_positions

    k_abs = jnp.concatenate(
        [ring_key_positions(cache_pos, w, B), positions], axis=1
    )  # [B, W + T]
    ka = k_abs[:, None, None, :]
    ok = (ka >= 0) & (ka <= q_pos) & (ka > q_pos - w)
    return jnp.where(ok, 0.0, neg)


def write_valid_mask(write_len, T: int):
    """[B, T] validity from per-row real token counts (None passthrough)."""
    if write_len is None:
        return None
    wl = jnp.asarray(write_len, jnp.int32).reshape(-1, 1)
    return jnp.arange(T)[None, :] < wl


def ring_attention_inputs(layer_cache, k, v, cache_pos, write_valid, dtype, B):
    """Read-concat-write for a ring layer around attention.

    Returns (k_cat, v_cat, k_scale, v_scale, k_shift, v_shift, new_cache):
    the PRE-write ring content concatenated with the in-chunk K/V (the
    chunk quantized exactly as the cache stores it, so in-chunk keys see
    cached numerics), and the post-write cache for the next call."""
    from ..tensor.kv_cache import (
        QKVCacheLayer,
        kv_read_raw,
        kv_ring_update,
        quantize_kv_chunk,
    )

    rk, rv, rks, rvs, rkm, rvm = kv_read_raw(layer_cache, dtype, B)
    if isinstance(layer_cache, QKVCacheLayer):
        ck, cv, cks, cvs, ckm, cvm = quantize_kv_chunk(
            layer_cache.qtype_name, k, v, dtype
        )
    else:
        ck, cv = k.astype(rk.dtype), v.astype(rv.dtype)
        cks = cvs = ckm = cvm = None
    cat = lambda a, b: None if a is None else jnp.concatenate([a, b], axis=1)
    new_cache = kv_ring_update(layer_cache, k, v, cache_pos, valid=write_valid)
    return (
        cat(rk, ck), cat(rv, cv),
        cat(rks, cks), cat(rvs, cvs),
        cat(rkm, ckm), cat(rvm, cvm),
        new_cache,
    )
