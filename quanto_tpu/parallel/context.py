"""Context (sequence) parallelism: KV sharded along S over an ``"sp"`` axis.

Long-context decode is KV-cache-bandwidth-bound; once a sequence's cache
outgrows one chip's HBM (or its streaming budget), the TPU-native scale-out
is to shard the CACHE along the sequence dimension and combine attention
with a DISTRIBUTED online softmax — each shard computes logits against its
own S/sp keys, and two tiny collectives (`pmax` of the running max, `psum`
of the exp-sum and the value-weighted numerator) produce the exact softmax
result. No ring pipeline needed at decode (T=1): the collectives move
[B, H, T]-sized statistics and one [B, T, H, D] numerator, never the cache.

The reference has nothing like this (no attention management at all,
SURVEY.md §5.7); the sp axis completes dp/tp/ep/pp.

Works with the quantized cache exactly like `ops/attention.gqa_attention`:
int8/s4 payload shards dequantize inside the einsum operand read, per-slot
scales factor out of the contractions (k_scale on the local logits, v_scale
on the local probabilities).
"""

from __future__ import annotations

import contextlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


__all__ = [
    "cp_gqa_attention",
    "shard_cache_seq",
    "cp_decode_attention",
    "cp_cached_attention",
    "sp_serving",
    "active_sp",
]


# Active sequence-parallel serving state: set (via `sp_serving`) around the
# engine's jit traces so model attention layers route their cached-attention
# reads through `cp_cached_attention`. Trace-time only — the stack is read
# while tracing, never inside compiled code.
_SP_STACK: List[Tuple[Mesh, str]] = []


@contextlib.contextmanager
def sp_serving(mesh: Mesh, axis: str = "sp"):
    """Route model cached-attention through the sequence-sharded path while
    tracing (used by the serving engine; usable around any jit trace)."""
    _SP_STACK.append((mesh, axis))
    try:
        yield
    finally:
        _SP_STACK.pop()


def active_sp() -> Optional[Tuple[Mesh, str]]:
    return _SP_STACK[-1] if _SP_STACK else None


def cp_gqa_attention(
    q5: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    axis: str,
    *,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    k_shift: Optional[jnp.ndarray] = None,
    v_shift: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sequence-sharded grouped-query attention (call INSIDE shard_map).

    q5 [B, T, Hkv, G, D] replicated; k/v [B, S/sp, Hkv, D] (this shard's
    keys/values, any storage dtype); mask [B or 1, 1, T, S/sp] additive for
    this shard's key positions; per-slot scales/shifts sharded with the
    cache (the asymmetric specs' rank-1 shift corrections distribute the
    same way the dense `gqa_attention` applies them — the k term is local
    to the logits, the v term rides the psum'd numerator).
    Returns the EXACT softmax attention output [B, T, Hkv*G*D], replicated.
    """
    from ..ops.attention import _slot_scale_t

    B, T, Hkv, G, D = q5.shape
    out_dtype = q5.dtype
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", q5, k, preferred_element_type=jnp.float32
    )
    if k_scale is not None:
        logits = logits * _slot_scale_t(k_scale, logits.dtype)
    if k_shift is not None:
        qsum = jnp.sum(q5.astype(jnp.float32), axis=-1)  # [B, T, Hkv, G]
        qsum = jnp.transpose(qsum, (0, 2, 3, 1))[..., None]
        logits = logits + qsum * _slot_scale_t(k_shift, jnp.float32)
    logits = logits * jnp.asarray(scale, logits.dtype)
    if mask is not None:
        logits = logits + mask[:, :, None].astype(logits.dtype)
    # Distributed online softmax: global max -> local exp -> psum of the
    # normalizer and of the value-weighted numerator.
    m = lax.pmax(jnp.max(logits, axis=-1, keepdims=True), axis)
    e = jnp.exp(logits - m)
    den = lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis)  # [B,Hkv,G,T,1]
    raw_e = e
    if v_scale is not None:
        e = e * _slot_scale_t(v_scale, e.dtype)
    num = jnp.einsum(
        "bhgqk,bkhd->bqhgd", e, v, preferred_element_type=jnp.float32
    )
    if v_shift is not None:
        corr = jnp.sum(raw_e * _slot_scale_t(v_shift, jnp.float32), axis=-1)
        num = num + jnp.transpose(corr, (0, 3, 1, 2))[..., None]
    num = lax.psum(num, axis)
    out = num / jnp.transpose(den, (0, 3, 1, 2, 4))
    return out.astype(out_dtype).reshape(B, T, Hkv * G * D)


def shard_cache_seq(layer_cache, mesh: Mesh, axis: str = "sp"):
    """Shard one layer's KV cache along the SEQUENCE dim over mesh[axis].

    Accepts the float tuple `(k, v)` ([B, S, H, D]) or a quantized
    `QKVCacheLayer` (payloads + per-slot scales all carry S in dim 1).
    """
    from ..tensor.kv_cache import QKVCacheLayer

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(None, axis, *([None] * (a.ndim - 2))))
        )

    if isinstance(layer_cache, QKVCacheLayer):
        return jax.tree_util.tree_map(put, layer_cache)
    ck, cv = layer_cache
    return put(ck), put(cv)


def cp_cached_attention(
    q5: jnp.ndarray,
    layer_cache,
    q_pos: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
) -> jnp.ndarray:
    """Causal attention over a sequence-sharded cache (host-level API).

    q5 [B, T, Hkv, G, D] replicated; `layer_cache` sharded by
    `shard_cache_seq`; `q_pos` [B, T] each query's global position (it
    attends to cache slots <= its position — T=1 decode and chunked prefill
    both reduce to this). Builds the per-shard causal mask from each shard's
    global key offsets and runs `cp_gqa_attention` under shard_map.
    """
    from ..tensor.kv_cache import QKVCacheLayer

    sp = mesh.shape[axis]
    if isinstance(layer_cache, QKVCacheLayer):
        S = layer_cache._k_data.shape[1]
        has_shift = layer_cache._k_shift is not None
        operands = (
            layer_cache._k_data, layer_cache._v_data,
            layer_cache._k_scale, layer_cache._v_scale,
        )
        if has_shift:
            operands = operands + (layer_cache._k_shift, layer_cache._v_shift)
        quantized = True
    else:
        ck, cv = layer_cache
        S = ck.shape[1]
        has_shift = False
        operands = (ck, cv)
        quantized = False
    S_loc = S // sp

    def body(q5, q_pos, *ops):
        shard = lax.axis_index(axis)
        k_pos = shard * S_loc + jnp.arange(S_loc)  # global key positions
        mask = jnp.where(
            k_pos[None, None, None, :] <= q_pos[:, None, :, None],
            0.0,
            jnp.finfo(jnp.float32).min,
        )
        if quantized:
            kd, vd, ks, vs = ops[:4]
            km, vm = ops[4:6] if has_shift else (None, None)
            return cp_gqa_attention(
                q5, kd.astype(q5.dtype), vd.astype(q5.dtype), mask, scale,
                axis, k_scale=ks, v_scale=vs, k_shift=km, v_shift=vm,
            )
        ck, cv = ops
        return cp_gqa_attention(
            q5, ck.astype(q5.dtype), cv.astype(q5.dtype), mask, scale, axis
        )

    op_specs = tuple(P(None, axis, *([None] * (o.ndim - 2))) for o in operands)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()) + op_specs,
        out_specs=P(),
        check_vma=False,
    )(q5, q_pos, *operands)


def cp_decode_attention(
    q5: jnp.ndarray,
    layer_cache,
    lengths: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
) -> jnp.ndarray:
    """Decode-step attention over a sequence-sharded cache.

    q5 [B, 1, Hkv, G, D] replicated; `lengths` [B] valid key counts (global
    positions < lengths attend). Thin wrapper over `cp_cached_attention`
    with q_pos = lengths - 1.
    """
    return cp_cached_attention(
        q5, layer_cache, (lengths - 1)[:, None], scale, mesh, axis
    )
