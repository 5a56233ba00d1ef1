"""Quantized KV cache.

Not present in the torch reference (it never manages attention or caches —
SURVEY.md §5.7); required by the TPU build's serving story: the KV cache is
the dominant HBM traffic at long context, so storing it int8/fp8 halves (or
quarters, vs f32) both footprint and decode bandwidth.

Scheme: per-slot, per-head symmetric scales — `data[B, S, H, D]` in the
storage dtype with `scale[B, S, H, 1]` float32, quantized at write time from
the absmax over the head dim. Dequantization happens in-register inside the
attention einsum's operand read (XLA fuses the convert+mul).

int4 cache (qint4): the payload is a native s4 array `[B, S, H, D]` — XLA
stores it 2 codes/byte in HBM and fuses the s4 -> float convert into the
attention einsum's operand read exactly like int8's, so decode cache traffic
halves again vs int8. Measured op-level at 8B decode shapes (B=4, S=8192,
bench/attn_int8_logits_bench.py): 46 us/step vs 115 int8 vs 203 bf16 — 2.5x.
A nibble-packed-uint8 + in-jit bitcast variant was tried first and is 1.4x
SLOWER than the int8 cache at the model level: the bitcast yields
[..., D/2, 2] whose merge back to [..., D] forces a materialized relayout
(2-lane tiled intermediate). Native s4 needs two axon-backend accommodations
(see utils/axon_compat.py): a shard-arg layout shim, and creating the zeros
on device inside a jit.

The cache is a plain pytree (`QKVCacheLayer`) so it flows through jit,
lax.scan carries, and `NamedSharding` like the float cache.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .qarray import register_qarray
from .qtype import qtype, qint8


__all__ = [
    "QKVCacheLayer",
    "init_quantized_kv_cache",
    "parse_kv_spec",
    "kv_update",
    "kv_read",
    "cache_max_len",
    "kv_ring_update",
    "ring_key_positions",
    "quantize_kv_chunk",
]


def cache_max_len(layer_cache) -> int:
    """Sequence capacity of a layer cache (float tuple, quantized, paged)."""
    from .paged_kv import PagedKVLayer, paged_max_len

    if isinstance(layer_cache, tuple):
        return layer_cache[0].shape[1]
    if isinstance(layer_cache, PagedKVLayer):
        return paged_max_len(layer_cache)
    return layer_cache._k_data.shape[1]


@register_qarray
class QKVCacheLayer:
    """One layer's quantized KV cache: int8/int4/fp8 payloads + per-slot
    scales (+ optional per-slot mean shifts for the asymmetric variants).

    `qtype_name` is a KV SPEC, not necessarily a plain qtype name — see
    `parse_kv_spec` ("qint8", "qint4", mixed "k8v4"/"k4v8", asymmetric
    "qint4a"). Dequantization is `data * scale (+ shift)`; the shift terms
    stay factorable in attention as rank-1 corrections (see gqa_attention).
    """

    _k_data: jnp.ndarray  # [B, S, H, D] storage dtype
    _k_scale: jnp.ndarray  # [B, S, H, 1] float32
    _v_data: jnp.ndarray
    _v_scale: jnp.ndarray
    qtype_name: str  # static: KV spec name (hashable aux data)
    _k_shift: jnp.ndarray = None  # [B, S, H, 1] float32 (asym specs only)
    _v_shift: jnp.ndarray = None


def _is_int4(qt: qtype) -> bool:
    return not qt.is_floating_point and qt.bits == 4


def parse_kv_spec(name: str):
    """KV cache spec -> (k_qtype, v_qtype, asymmetric).

    Accepted: any plain qtype name ("qint8", "qint4", "qfloat8_e4m3fn", ...),
    the mixed-precision pairs "k8v4" / "k4v8" (K int8 + V int4 and vice
    versa — K error dominates attention fidelity, so k8v4 recovers most of
    int8's quality at 3/4 of int4+int8's traffic), and an "a" suffix for
    per-slot asymmetric (mean-shifted) quantization ("qint4a", "k8v4a"):
    the mean over the head dim is stored per slot and re-applied as rank-1
    corrections inside attention, halving the effective step for skewed
    distributions (RoPE'd K heads) at no payload cost.
    """
    from .qtype import qtypes

    asym = False
    base = name
    if name.endswith("a") and name not in qtypes:
        asym = True
        base = name[:-1]
    if base == "k8v4":
        return qtypes["qint8"], qtypes["qint4"], asym
    if base == "k4v8":
        return qtypes["qint4"], qtypes["qint8"], asym
    return qtypes[base], qtypes[base], asym


def device_zeros(shape, dtype) -> jnp.ndarray:
    """`jnp.zeros` that also works for sub-byte dtypes on the axon backend:
    the constant is materialized inside a jit (no host -> device transfer of
    an s4 buffer), and the shard-arg shim lets the result flow into later
    jits."""
    if dtype in (jnp.int4, jnp.uint4):
        from ..utils import axon_compat

        axon_compat.apply()
        return jax.jit(lambda: jnp.zeros(shape, dtype))()
    return jnp.zeros(shape, dtype)


def init_quantized_kv_cache(
    n_layers: int,
    batch: int,
    max_len: int,
    n_kv_heads: int,
    head_dim: int,
    qt=qint8,
) -> Tuple[QKVCacheLayer, ...]:
    """`qt` is a qtype or a KV spec name (see `parse_kv_spec`)."""
    spec = qt.name if isinstance(qt, qtype) else str(qt)
    k_qt, v_qt, asym = parse_kv_spec(spec)
    shape = (batch, max_len, n_kv_heads, head_dim)
    sshape = (batch, max_len, n_kv_heads, 1)

    def payload(q):
        return device_zeros(shape, jnp.int4 if _is_int4(q) else q.dtype)

    return tuple(
        QKVCacheLayer(
            _k_data=payload(k_qt),
            _k_scale=jnp.ones(sshape, jnp.float32),
            _v_data=payload(v_qt),
            _v_scale=jnp.ones(sshape, jnp.float32),
            qtype_name=spec,
            _k_shift=jnp.zeros(sshape, jnp.float32) if asym else None,
            _v_shift=jnp.zeros(sshape, jnp.float32) if asym else None,
        )
        for _ in range(n_layers)
    )


def _quantize_slot(t: jnp.ndarray, qt: qtype, asym: bool = False):
    """Per-(batch, pos, head) quantization over the head dim.

    Symmetric: `deq = data * scale`, shift returned as None. Asymmetric
    (`asym=True`): centered on the per-slot mean — `deq = data * scale +
    shift` — which halves the effective step for skewed head distributions
    (e.g. RoPE'd K) at the cost of one extra f32 per slot."""
    tf = t.astype(jnp.float32)
    shift = None
    if asym:
        shift = jnp.mean(tf, axis=-1, keepdims=True)
        tf = tf - shift
    amax = jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qt.qmax, 1e-8)
    data = tf / scale
    if not qt.is_floating_point:
        data = jnp.round(data)
    if _is_int4(qt):
        # Symmetric code range: stay off -8 so the range mirrors (+/-7).
        return jnp.clip(data, -qt.qmax, qt.qmax).astype(jnp.int4), scale, shift
    data = jnp.clip(data, qt.qmin, qt.qmax).astype(qt.dtype)
    return data, scale, shift


def _update(cache: jnp.ndarray, new: jnp.ndarray, pos) -> jnp.ndarray:
    """Write `new` [B, T, ...] into `cache` [B, S, ...] at sequence offset
    `pos` — a scalar (shared) or a [B] vector (per-slot, for continuous
    batching)."""
    pos = jnp.asarray(pos)
    if pos.ndim == 0:
        return lax.dynamic_update_slice(cache, new, (0,) + (pos,) + (0,) * (cache.ndim - 2))
    zeros = (0,) * (cache.ndim - 2)
    return jax.vmap(
        lambda c, n, p: lax.dynamic_update_slice(c, n, (p,) + zeros)
    )(cache, new, pos)


def kv_update(layer_cache, k: jnp.ndarray, v: jnp.ndarray, pos) -> object:
    """Write new K/V ([B, T, H, D]) at `pos` (scalar or per-batch [B] vector);
    works for float tuples, quantized QKVCacheLayer and paged caches."""
    from .paged_kv import PagedKVLayer, paged_update

    if isinstance(layer_cache, PagedKVLayer):
        return paged_update(layer_cache, k, v, pos)
    if isinstance(layer_cache, QKVCacheLayer):
        k_qt, v_qt, asym = parse_kv_spec(layer_cache.qtype_name)
        kd, ks, km = _quantize_slot(k, k_qt, asym)
        vd, vs, vm = _quantize_slot(v, v_qt, asym)
        return QKVCacheLayer(
            _k_data=_update(layer_cache._k_data, kd, pos),
            _k_scale=_update(layer_cache._k_scale, ks, pos),
            _v_data=_update(layer_cache._v_data, vd, pos),
            _v_scale=_update(layer_cache._v_scale, vs, pos),
            qtype_name=layer_cache.qtype_name,
            _k_shift=(
                _update(layer_cache._k_shift, km, pos) if asym else None
            ),
            _v_shift=(
                _update(layer_cache._v_shift, vm, pos) if asym else None
            ),
        )
    ck, cv = layer_cache
    return (
        _update(ck, k.astype(ck.dtype), pos),
        _update(cv, v.astype(cv.dtype), pos),
    )


def kv_read(layer_cache, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-cache K/V in the compute dtype (materializes the dequantization —
    prefer `kv_read_raw` + scale factoring on the hot path)."""
    if isinstance(layer_cache, QKVCacheLayer):
        k = layer_cache._k_data.astype(jnp.float32) * layer_cache._k_scale
        v = layer_cache._v_data.astype(jnp.float32) * layer_cache._v_scale
        if layer_cache._k_shift is not None:
            k = k + layer_cache._k_shift
            v = v + layer_cache._v_shift
        return k.astype(dtype), v.astype(dtype)
    ck, cv = layer_cache
    return ck.astype(dtype), cv.astype(dtype)


def kv_read_raw(layer_cache, dtype, batch: int = None):
    """(k, v, k_scale, v_scale, k_shift, v_shift) — scales/shifts are None
    for float caches, shifts are None for the symmetric specs.
    For paged caches, `batch` selects slots 0..batch-1 (dense gathered view).

    For quantized caches the payloads are returned as `dtype` WITHOUT the
    scale multiply (XLA fuses the convert into the attention einsum's operand
    read), and the per-slot scales come separately so attention can factor
    them out of the contractions:

        logits[b,h,q,s] = (q . k_int8[s]) * s_k[s]      (scale on logits)
        out = (probs * s_v[s]) @ v_int8                  (scale on probs)

    This moves the scale work from O(S*H*D) element dequant to O(H*T*S) —
    measured necessary on v5e, where the materialized dequant made the int8
    cache SLOWER than bf16."""
    from .paged_kv import PagedKVLayer, paged_read_raw

    if isinstance(layer_cache, PagedKVLayer):
        return paged_read_raw(layer_cache, batch, dtype)
    if isinstance(layer_cache, QKVCacheLayer):
        return (
            layer_cache._k_data.astype(dtype),
            layer_cache._v_data.astype(dtype),
            layer_cache._k_scale,
            layer_cache._v_scale,
            layer_cache._k_shift,
            layer_cache._v_shift,
        )
    ck, cv = layer_cache
    return ck.astype(dtype), cv.astype(dtype), None, None, None, None


# --- sliding-window ring caches (round 5) ----------------------------------
#
# A sliding-attention layer (GPT-OSS every other layer, window 128) only
# ever attends to the last W positions, yet a plain cache stores and
# STREAMS all max_len slots and masks the rest away — at ctx 8192 that is
# 64x wasted payload on half the layers. A ring cache stores exactly W
# slots; writes land at pos % W. Attention reads the PRE-write ring
# concatenated with the in-chunk K/V (read-then-write), which is exact for
# any chunk length: every key an in-chunk query needs is either still in
# the pre-write ring or among the chunk's own keys, so in-chunk overwrites
# can never clobber a needed key (the post-write-read formulation WOULD
# lose ring keys overwritten by later in-chunk positions). The
# absolute-position mask (`ring_key_positions`) hides never-written and
# out-of-window slots.
# No torch-reference analogue (the reference never manages caches);
# the HF/vLLM sliding-window cache is the behavioral model.


def _ring_write(cache: jnp.ndarray, new: jnp.ndarray, pos, valid=None) -> jnp.ndarray:
    """Write `new` [B, T, ...] into the ring `cache` [B, W, ...] at slots
    (pos + t) % W; `pos` scalar or [B]. Chunks longer than W keep their
    last W positions (earlier ones would be overwritten in-chunk).

    `valid` [B, T] bool masks PAD/GARBAGE columns (fixed-shape engine
    chunks): masked positions keep the slot's current content. Unlike the
    flat-cache layout, a ring CANNOT rely on "garbage lands at future
    positions": (pos + t) % W aliases a future position onto a live window
    slot, so unmasked pad writes would destroy real keys."""
    W = cache.shape[1]
    B, T = new.shape[0], new.shape[1]
    pos = jnp.asarray(pos)
    if pos.ndim == 0:
        pos = jnp.broadcast_to(pos, (B,))
    if valid is None:
        valid = jnp.ones((B, T), bool)
    if T > W:
        new, valid = new[:, -W:], valid[:, -W:]
        pos = pos + (T - W)
        T = W
    slots = (pos[:, None] + jnp.arange(T)[None, :]) % W  # [B, T], unique/row
    new = new.astype(cache.dtype)

    def row(c, n, s, vld):
        keep = c[s]  # current content of the target slots
        vld = vld.reshape((T,) + (1,) * (n.ndim - 1))
        return c.at[s].set(jnp.where(vld, n, keep))

    return jax.vmap(row)(cache, new, slots, valid)


def kv_ring_update(layer_cache, k: jnp.ndarray, v: jnp.ndarray, pos, valid=None) -> object:
    """Ring-buffer analogue of `kv_update` for a W-slot sliding cache.
    `valid` [B, T] masks pad/garbage chunk columns (see `_ring_write`)."""
    if isinstance(layer_cache, QKVCacheLayer):
        k_qt, v_qt, asym = parse_kv_spec(layer_cache.qtype_name)
        kd, ks, km = _quantize_slot(k, k_qt, asym)
        vd, vs, vm = _quantize_slot(v, v_qt, asym)
        w = lambda c, n: _ring_write(c, n, pos, valid)
        return QKVCacheLayer(
            _k_data=w(layer_cache._k_data, kd),
            _k_scale=w(layer_cache._k_scale, ks),
            _v_data=w(layer_cache._v_data, vd),
            _v_scale=w(layer_cache._v_scale, vs),
            qtype_name=layer_cache.qtype_name,
            _k_shift=w(layer_cache._k_shift, km) if asym else None,
            _v_shift=w(layer_cache._v_shift, vm) if asym else None,
        )
    ck, cv = layer_cache
    return (_ring_write(ck, k, pos, valid), _ring_write(cv, v, pos, valid))


def ring_key_positions(pos0, W: int, batch: int) -> jnp.ndarray:
    """Absolute positions held by the PRE-write ring slots: slot j holds the
    largest position < pos0 congruent to j (mod W); negative = never
    written. `pos0` scalar or [B]; returns [B, W] int32."""
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (batch,))
    j = jnp.arange(W, dtype=jnp.int32)[None, :]
    p = pos0[:, None]
    # largest value <= p-1 with value % W == j
    return j + W * jnp.floor_divide(p - 1 - j, W)


def quantize_kv_chunk(spec_name: str, k: jnp.ndarray, v: jnp.ndarray, dtype):
    """Quantize an in-chunk K/V pair into the same raw format `kv_read_raw`
    returns (payload cast to `dtype`, separate scales/shifts) so a ring
    layer can concatenate cache and chunk before attention."""
    k_qt, v_qt, asym = parse_kv_spec(spec_name)
    kd, ks, km = _quantize_slot(k, k_qt, asym)
    vd, vs, vm = _quantize_slot(v, v_qt, asym)
    return kd.astype(dtype), vd.astype(dtype), ks, vs, km, vm
