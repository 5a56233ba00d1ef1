"""Paged KV cache: page-pool storage with per-slot page tables.

Not in the torch reference (it has no serving layer, SURVEY.md §5.7). The
slot-pooled cache (`tensor/kv_cache.py`) preallocates `max_batch × max_len`
slots — HBM capacity scales with the WORST-CASE sequence length of every
slot. Here the cache is a pool of fixed-size pages `[n_pages, page_size, H,
D]` plus an int32 page table `[max_slots, max_pages_per_slot]`; a slot only
consumes pages its sequence actually reached, so total capacity is
`n_pages × page_size` tokens shared across slots (vLLM-style paging, done
the TPU way: static shapes, scatter/gather, table rows assigned by the host
engine).

Reads gather the table's pages into the dense `[B, S_max, H, D]` view the
attention paths (einsum or flash-decode kernel) consume — functionally
identical to the dense cache; in-kernel page indirection (scalar-prefetch
table lookups in the index map) is the round-2 bandwidth optimization.

Quantized paging composes: int8/fp8 payload pages carry per-slot scale pages,
the same factored-scale algebra as `QKVCacheLayer`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .qarray import register_qarray
from .qtype import qtype, qtypes


__all__ = [
    "PagedKVLayer",
    "init_paged_kv_cache",
    "paged_update",
    "paged_read_raw",
    "paged_max_len",
]


@register_qarray
class PagedKVLayer:
    """One layer's paged KV storage.

    `_k_pages`/`_v_pages`: [n_pages, page_size, H, D] payload (float or
    quantized storage dtype); `_k_scale`/`_v_scale`: [n_pages, page_size, H,
    1] f32 per-slot scales (all-ones when float); `table`: [max_slots,
    pages_per_slot] int32 page ids (shared across layers; duplicated per
    layer in the pytree — 4·slots·pages bytes, negligible). Page 0 is a
    reserved scratch page so unassigned table entries scatter harmlessly.
    """

    _k_pages: jnp.ndarray
    _v_pages: jnp.ndarray
    _k_scale: jnp.ndarray
    _v_scale: jnp.ndarray
    _table: jnp.ndarray
    qtype_name: Optional[str]  # static: KV spec (see kv_cache.parse_kv_spec)
    _k_shift: jnp.ndarray = None  # per-slot mean shifts (asym specs only)
    _v_shift: jnp.ndarray = None


def init_paged_kv_cache(
    n_layers: int,
    n_pages: int,
    page_size: int,
    max_slots: int,
    pages_per_slot: int,
    n_kv_heads: int,
    head_dim: int,
    kv_quant=None,
    dtype=jnp.bfloat16,
) -> Tuple[PagedKVLayer, ...]:
    from .kv_cache import device_zeros, parse_kv_spec

    spec = None
    k_qt = v_qt = None
    asym = False
    if kv_quant is not None:
        spec = kv_quant.name if isinstance(kv_quant, qtype) else str(kv_quant)
        k_qt, v_qt, asym = parse_kv_spec(spec)

    def pdtype(q):
        # int4 pages are native s4 (see tensor/kv_cache.py module docs).
        if q is None:
            return dtype
        return jnp.int4 if (not q.is_floating_point and q.bits == 4) else q.dtype

    shape = (n_pages, page_size, n_kv_heads, head_dim)
    # Scale pages only exist for quantized payloads (dummy scalar otherwise).
    sshape = (n_pages, page_size, n_kv_heads, 1) if spec is not None else (1, 1, 1, 1)
    table = jnp.zeros((max_slots, pages_per_slot), jnp.int32)
    return tuple(
        PagedKVLayer(
            _k_pages=device_zeros(shape, pdtype(k_qt)),
            _v_pages=device_zeros(shape, pdtype(v_qt)),
            _k_scale=jnp.ones(sshape, jnp.float32),
            _v_scale=jnp.ones(sshape, jnp.float32),
            _table=table,
            qtype_name=spec,
            _k_shift=jnp.zeros(sshape, jnp.float32) if asym else None,
            _v_shift=jnp.zeros(sshape, jnp.float32) if asym else None,
        )
        for _ in range(n_layers)
    )


def paged_max_len(layer: PagedKVLayer) -> int:
    return layer._table.shape[1] * layer._k_pages.shape[1]


def _scatter_tokens(pages, values, page_ids, offsets):
    """pages[page_ids[b,t], offsets[b,t]] = values[b,t] for every (b, t)."""
    flat_vals = values.reshape((-1,) + values.shape[2:])
    flat_pages = page_ids.reshape(-1)
    flat_offs = offsets.reshape(-1)
    return pages.at[flat_pages, flat_offs].set(flat_vals.astype(pages.dtype))


def paged_update(layer: PagedKVLayer, k: jnp.ndarray, v: jnp.ndarray, pos) -> PagedKVLayer:
    """Write new K/V [B, T, H, D] at sequence offsets `pos` (scalar or [B])
    through the page table of slots 0..B-1."""
    B, T = k.shape[0], k.shape[1]
    ps = layer._k_pages.shape[1]
    pos = jnp.asarray(pos)
    if pos.ndim == 0:
        pos = jnp.broadcast_to(pos, (B,))
    positions = pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    page_ids = layer._table[jnp.arange(B)[:, None], positions // ps]  # [B, T]
    offsets = positions % ps

    km = vm = None
    if layer.qtype_name is not None:
        from .kv_cache import _quantize_slot, parse_kv_spec

        k_qt, v_qt, asym = parse_kv_spec(layer.qtype_name)
        kd, ks, km = _quantize_slot(k, k_qt, asym)
        vd, vs, vm = _quantize_slot(v, v_qt, asym)
    else:
        kd, vd = k, v
        ks = vs = None
    new = PagedKVLayer(
        _k_pages=_scatter_tokens(layer._k_pages, kd, page_ids, offsets),
        _v_pages=_scatter_tokens(layer._v_pages, vd, page_ids, offsets),
        _k_scale=(
            _scatter_tokens(layer._k_scale, ks, page_ids, offsets)
            if ks is not None
            else layer._k_scale
        ),
        _v_scale=(
            _scatter_tokens(layer._v_scale, vs, page_ids, offsets)
            if vs is not None
            else layer._v_scale
        ),
        _table=layer._table,
        qtype_name=layer.qtype_name,
        _k_shift=(
            _scatter_tokens(layer._k_shift, km, page_ids, offsets)
            if km is not None
            else layer._k_shift
        ),
        _v_shift=(
            _scatter_tokens(layer._v_shift, vm, page_ids, offsets)
            if vm is not None
            else layer._v_shift
        ),
    )
    return new


def paged_read_raw(layer: PagedKVLayer, batch: int, dtype):
    """Dense per-slot views (k, v, k_scale, v_scale, k_shift, v_shift) for
    slots 0..batch-1: [B, S_max, H, D] gathered through the page table
    (scales/shifts None for float pages / symmetric specs). The attention
    paths consume this exactly like the dense cache."""
    table = layer._table[:batch]  # [B, P]
    B, P = table.shape
    ps = layer._k_pages.shape[1]

    def gather(pages):
        g = pages[table]  # [B, P, ps, H, D]
        return g.reshape(B, P * ps, *pages.shape[2:])

    k = gather(layer._k_pages).astype(dtype)
    v = gather(layer._v_pages).astype(dtype)
    if layer.qtype_name is None:
        return k, v, None, None, None, None
    km = gather(layer._k_shift) if layer._k_shift is not None else None
    vm = gather(layer._v_shift) if layer._v_shift is not None else None
    return k, v, gather(layer._k_scale), gather(layer._v_scale), km, vm
