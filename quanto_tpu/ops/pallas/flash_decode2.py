"""Flash-decode v2: full-row cache blocks, one grid step per batch element.

Round-1's kernel (`flash_decode.py`) lost 3x to the XLA einsum path at
B=8/ctx=2048 (RESULTS.md "Healthy-session re-benchmark"). Root-cause
hypothesis (VERDICT #2): its cache block `(1, S, 1, KD)` carries the
singleton head-group axis in the SUBLANE position — a 1-row tile that the
(8, 128) TPU tiling pads 8x, so every cache byte streamed 8 neighbours of
padding with it.

v2 restructures the data movement:

- the cache is VIEWED as `[B, S, Hkv*D]` (a free reshape of the stored
  `[B, S, Hkv, D]` — same bytes), so a block is `(1, S, Hkv*D)` whose
  trailing dims `(S, Hkv*D)` are exactly tile-shaped: zero padding, fully
  contiguous rows;
- ONE grid step per batch element processes ALL kv heads: queries arrive
  block-diagonal over the full `Hkv*D` lane width (head h's rows occupy
  lane slice h*D:(h+1)*D), so a single `[M, Hkv*D] x [S, Hkv*D]^T` dot
  yields every head's logits and a single `[M, S] x [S, Hkv*D]` dot the
  outputs — zero lanes cancel cross-head terms exactly;
- int8 caches feed the MXU raw with per-slot scales factored onto logits
  and probs (same algebra as `tensor/kv_cache.kv_read_raw`).

The MXU overspend of the block-diagonal trick (Hkv x) is irrelevant:
decode attention is HBM-bound.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["flash_decode2_call"]

_NEG = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, *, sb, scale, hkv, g):
    b = pl.program_id(0)
    pos = pos_ref[b]
    M, HD = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    nchunks = S // sb
    rows = hkv * g

    dot_dtype = q_ref.dtype
    qf = q_ref[0]  # [M, HD] block-diagonal over all kv heads

    def expand_rows(s_ref, c):
        # [Hkv, sb] per-head scale rows -> [M, sb] (head h covers rows
        # h*g..(h+1)*g; padding rows get ones).
        parts = [
            jnp.broadcast_to(s_ref[0, h, c * sb : (c + 1) * sb][None, :], (g, sb))
            for h in range(hkv)
        ]
        if M != rows:
            parts.append(jnp.ones((M - rows, sb), jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def load(ref, c):
        t = ref[0, c * sb : (c + 1) * sb, :]
        if t.dtype == jnp.int8:
            t = t.astype(jnp.int32).astype(jnp.float32)
        return t.astype(dot_dtype)  # [sb, HD]

    chunks = []
    for c in range(nchunks):
        lc = jax.lax.dot_general(
            qf, load(k_ref, c), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [M, sb] f32
        if ks_ref is not None:
            lc = lc * expand_rows(ks_ref, c)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, sb), 1) + c * sb
        chunks.append(jnp.where(col <= pos, lc, _NEG))
    logits = jnp.concatenate(chunks, axis=1)  # [M, S]

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    acc = jnp.zeros((M, HD), jnp.float32)
    for c in range(nchunks):
        pc = p[:, c * sb : (c + 1) * sb]
        if vs_ref is not None:
            pc = pc * expand_rows(vs_ref, c)
        acc = acc + jax.lax.dot_general(
            pc.astype(dot_dtype), load(v_ref, c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("sb", "scale", "hkv", "g", "has_scales", "interpret")
)
def _call(qbd, k3, v3, ks, vs, pos, *, sb, scale, hkv, g, has_scales, interpret=False):
    B, M, HD = qbd.shape
    S = k3.shape[1]
    kernel = functools.partial(_kernel, sb=sb, scale=scale, hkv=hkv, g=g)
    if not has_scales:
        kernel = functools.partial(
            lambda pr, qr, kr, vr, o, **kw: _kernel(pr, qr, kr, vr, None, None, o, **kw),
            sb=sb, scale=scale, hkv=hkv, g=g,
        )
    in_specs = [
        pl.BlockSpec((1, M, HD), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((1, S, HD), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((1, S, HD), lambda b, *_: (b, 0, 0)),
    ]
    args = [qbd, k3, v3]
    if has_scales:
        in_specs += [
            pl.BlockSpec((1, hkv, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, hkv, S), lambda b, *_: (b, 0, 0)),
        ]
        args += [ks, vs]
    payload = S * HD * k3.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, M, HD), lambda b, *_: (b, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, HD), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * S * HD,
            bytes_accessed=B * (2 * payload + M * HD * 8 + (8 * hkv * S if has_scales else 0)),
            transcendentals=B * M * S,
        ),
    )(pos, *args)


def flash_decode2_call(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_scale: Optional[jnp.ndarray],
    v_scale: Optional[jnp.ndarray],
    positions: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Same contract as `flash_decode.flash_decode_call`:
    q [B, Hkv, G, D], k/v [B, S, Hkv, D] raw payload, scales
    [B, S, Hkv, 1] f32 or None, positions [B]. Returns [B, Hkv, G, D] in
    q.dtype or None when out of envelope."""
    B, Hkv, G, D = q.shape
    S = k.shape[1]
    HD = Hkv * D
    if D % 64 != 0 or S % 128 != 0 or HD % 128 != 0:
        return None
    if k.dtype not in (jnp.int8, jnp.bfloat16, jnp.float32):
        return None
    # k + v blocks (double-buffered) + f32 logits/probs must fit VMEM.
    if 4 * S * HD * k.dtype.itemsize > 64 * 1024 * 1024:
        return None
    sb = next((c for c in (512, 256, 128) if S % c == 0), None)
    if sb is None:
        return None
    rows = Hkv * G
    m_pad = -rows % 8

    # Block-diagonal queries over ALL kv heads: [B, rows, HD] with head h's
    # rows in lane slice h*D:(h+1)*D.
    eye = jnp.eye(Hkv, dtype=q.dtype)
    qbd = jnp.einsum("bhgd,hj->bhgjd", q, eye).reshape(B, rows, HD)
    if m_pad:
        qbd = jnp.pad(qbd, ((0, 0), (0, m_pad), (0, 0)))

    k3 = k.reshape(B, S, HD)
    v3 = v.reshape(B, S, HD)
    has_scales = k_scale is not None
    ks = vs = None
    if has_scales:
        ks = jnp.transpose(k_scale[..., 0], (0, 2, 1))  # [B, Hkv, S]
        vs = jnp.transpose(v_scale[..., 0], (0, 2, 1))
    out = _call(
        qbd, k3, v3, ks, vs, positions.astype(jnp.int32),
        sb=sb, scale=D ** -0.5, hkv=Hkv, g=G, has_scales=has_scales,
        interpret=interpret,
    )
    out5 = out[:, :rows].reshape(B, Hkv, G, Hkv, D)
    res = jnp.einsum("bhgjd,hj->bhgd", out5, eye.astype(out5.dtype))
    return res.astype(q.dtype)
