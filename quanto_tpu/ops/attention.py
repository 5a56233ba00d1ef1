"""Decode-attention dispatch shared by the model families.

Routes single-token decode steps to the fused Pallas flash-decode kernel
(`ops/pallas/flash_decode.py`) when enabled and in-envelope, returning None
otherwise so the caller falls back to its XLA einsum path. Centralizing the
gating keeps every model family (llama/mixtral/gpt2/opt) on the same rules —
the analogue of the reference's per-backend kernel gating in
`optimum/quanto/tensor/weights/qbits.py:94-138`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import config as ops_config


__all__ = ["try_flash_decode"]

# Bench/tuning knob: "v2" (full-row tile-aligned blocks), "v3" (multi-batch
# grid steps + online-softmax S chunks; knobs _V3_BB/_V3_SB), "v1" (round-1
# per-head-group blocks), "auto" = v3-then-v2-then-v1. Read at TRACE time
# (rebuild jitted fns to pick up changes).
_VARIANT = "auto"
_V3_BB = 4
_V3_SB = None


def try_flash_decode(
    q: jnp.ndarray,
    new_cache,
    cache_pos,
    num_kv_heads: int,
    head_dim: int,
) -> Optional[jnp.ndarray]:
    """Fused decode attention over the just-updated cache.

    q: [B, 1, H, D] post-rope queries (T == 1 decode step). Returns
    [B, 1, H*D] attention output, or None when the kernel is disabled or the
    shapes/dtypes are outside its envelope.
    """
    if not ops_config.use_flash_decode():
        return None
    from ..tensor.kv_cache import QKVCacheLayer
    from ..tensor.paged_kv import PagedKVLayer, paged_read_raw
    from .pallas.flash_decode import flash_decode_call
    from .pallas.flash_decode2 import flash_decode2_call
    from .pallas.flash_decode3 import flash_decode3_call

    B = q.shape[0]
    num_heads = q.shape[2]
    if isinstance(new_cache, QKVCacheLayer):
        kd, vd = new_cache._k_data, new_cache._v_data
        if kd.dtype == jnp.int4:
            # s4 cache: outside the kernels' envelope (they read the payload
            # directly); the einsum path's fused s4 convert is also the
            # measured-fastest route (46 us vs 115 int8 at 8B/S=8192,
            # bench/attn_int8_logits_bench.py).
            return None
        ks, vs = new_cache._k_scale, new_cache._v_scale
    elif isinstance(new_cache, PagedKVLayer):
        if new_cache._k_pages.dtype == jnp.int4:
            return None  # s4 pages: einsum path (see above)
        # Dense gathered view; in-kernel page-table indirection is the
        # round-2 bandwidth optimization.
        kd, vd, ks, vs = paged_read_raw(new_cache, B, new_cache._k_pages.dtype)
    else:
        (kd, vd), (ks, vs) = new_cache, (None, None)
    pos_vec = jnp.broadcast_to(jnp.asarray(cache_pos).reshape(-1), (B,))
    qg = q.reshape(B, num_kv_heads, num_heads // num_kv_heads, head_dim)
    # auto order: v3 (multi-batch grid + online softmax) first, then v2
    # (full-row tile-aligned blocks), then v1 for shapes outside their
    # envelopes (e.g. Hkv*D not lane-aligned).
    out = None
    if _VARIANT in ("auto", "v3"):
        out = flash_decode3_call(
            qg, kd, vd, ks, vs, pos_vec,
            bb=_V3_BB, sb=_V3_SB, interpret=ops_config.pallas_interpret(),
        )
    if out is None and _VARIANT in ("auto", "v2"):
        out = flash_decode2_call(
            qg, kd, vd, ks, vs, pos_vec, interpret=ops_config.pallas_interpret()
        )
    if out is None and _VARIANT in ("auto", "v1"):
        out = flash_decode_call(
            qg, kd, vd, ks, vs, pos_vec, interpret=ops_config.pallas_interpret()
        )
    if out is None:
        return None
    return out.reshape(B, 1, num_heads * head_dim)
