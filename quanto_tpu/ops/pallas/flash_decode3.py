"""Flash-decode v3: multi-batch-row grid steps + online-softmax S chunking.

v2 (`flash_decode2.py`) fixed the tile-padding DMA inflation (2.3x over v1)
but still trails the XLA einsum path at B=8 (0.74-0.85x) — consistent with
per-grid-step fixed costs dominating when each of B steps only moves ~4 MB
and computes ~microseconds of MXU work. v3 attacks exactly that:

- `bb` batch rows per grid step (block `(bb, sb, Hkv*D)`): B/bb steps
  instead of B, amortizing the fixed per-step cost;
- optional S chunking (`sb < S`) with the classic online-softmax
  accumulator (running max/denominator/accumulator in VMEM scratch),
  giving the pipeline more steps to overlap DMA with compute and keeping
  VMEM flat for long contexts;
- same tile-aligned `[B, S, Hkv*D]` cache view and block-diagonal queries
  as v2; int8 payloads feed the MXU raw with factored per-slot scales.

The S grid axis is `arbitrary` (sequential) and the batch axis `parallel`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["flash_decode3_call"]

_NEG = -1e30


def _kernel(
    pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, sb, scale, hkv, g, nchunks,
):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    BB, M, HD = q_ref.shape
    rows = hkv * g

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dot_dtype = q_ref.dtype

    def expand_rows(s_ref, b):
        parts = [
            jnp.broadcast_to(s_ref[b, h, :][None, :], (g, sb)) for h in range(hkv)
        ]
        if M != rows:
            parts.append(jnp.ones((M - rows, sb), jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def load(ref, b):
        t = ref[b]
        if t.dtype == jnp.int8:
            t = t.astype(jnp.int32).astype(jnp.float32)
        return t.astype(dot_dtype)  # [sb, HD]

    col = jax.lax.broadcasted_iota(jnp.int32, (M, sb), 1) + c * sb
    for b in range(BB):
        pos = pos_ref[bi * BB + b]
        lc = jax.lax.dot_general(
            q_ref[b], load(k_ref, b), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [M, sb]
        if ks_ref is not None:
            lc = lc * expand_rows(ks_ref, b)
        lc = jnp.where(col <= pos, lc, _NEG)

        m_prev = m_ref[b]  # [M, 1]
        m_new = jnp.maximum(m_prev, jnp.max(lc, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        e = jnp.exp(lc - m_new)  # [M, sb]
        l_ref[b] = l_ref[b] * corr + jnp.sum(e, axis=1, keepdims=True)
        pc = e
        if vs_ref is not None:
            pc = pc * expand_rows(vs_ref, b)
        pv = jax.lax.dot_general(
            pc.astype(dot_dtype), load(v_ref, b),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[b] = acc_ref[b] * corr + pv
        m_ref[b] = m_new

    @pl.when(c == nchunks - 1)
    def _fin():
        out_ref[:] = acc_ref[:] / l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("bb", "sb", "scale", "hkv", "g", "has_scales", "interpret"),
)
def _call(qbd, k3, v3, ks, vs, pos, *, bb, sb, scale, hkv, g, has_scales, interpret=False):
    B, M, HD = qbd.shape
    S = k3.shape[1]
    nchunks = S // sb
    kernel = functools.partial(
        _kernel, sb=sb, scale=scale, hkv=hkv, g=g, nchunks=nchunks
    )
    if not has_scales:
        kernel = functools.partial(
            lambda pr, qr, kr, vr, o, m, l, a, **kw: _kernel(
                pr, qr, kr, vr, None, None, o, m, l, a, **kw
            ),
            sb=sb, scale=scale, hkv=hkv, g=g, nchunks=nchunks,
        )
    in_specs = [
        pl.BlockSpec((bb, M, HD), lambda bi, c, *_: (bi, 0, 0)),
        pl.BlockSpec((bb, sb, HD), lambda bi, c, *_: (bi, c, 0)),
        pl.BlockSpec((bb, sb, HD), lambda bi, c, *_: (bi, c, 0)),
    ]
    args = [qbd, k3, v3]
    if has_scales:
        in_specs += [
            pl.BlockSpec((bb, hkv, sb), lambda bi, c, *_: (bi, 0, c)),
            pl.BlockSpec((bb, hkv, sb), lambda bi, c, *_: (bi, 0, c)),
        ]
        args += [ks, vs]
    payload = S * HD * k3.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, nchunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, M, HD), lambda bi, c, *_: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bb, M, 1), jnp.float32),
            pltpu.VMEM((bb, M, 1), jnp.float32),
            pltpu.VMEM((bb, M, HD), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, HD), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * S * HD,
            bytes_accessed=B * (2 * payload + M * HD * 8 + (8 * hkv * S if has_scales else 0)),
            transcendentals=B * M * S,
        ),
    )(pos, *args)


def flash_decode3_call(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_scale: Optional[jnp.ndarray],
    v_scale: Optional[jnp.ndarray],
    positions: jnp.ndarray,
    *,
    bb: int = 4,
    sb: Optional[int] = None,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Same contract as `flash_decode2_call`; `bb` = batch rows per grid
    step, `sb` = S chunk (None -> min(S, 512))."""
    B, Hkv, G, D = q.shape
    S = k.shape[1]
    HD = Hkv * D
    if D % 64 != 0 or S % 128 != 0 or HD % 128 != 0:
        return None
    if k.dtype not in (jnp.int8, jnp.bfloat16, jnp.float32):
        return None
    while B % bb:
        bb //= 2
    if sb is None:
        sb = min(S, 512)
    if S % sb != 0:
        sb = next((c for c in (512, 256, 128) if S % c == 0), None)
        if sb is None:
            return None
    # k+v chunk blocks (double-buffered) must fit VMEM beside the scratch.
    if 4 * bb * sb * HD * k.dtype.itemsize > 48 * 1024 * 1024:
        return None
    rows = Hkv * G
    m_pad = -rows % 8

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
        bb=bb, sb=sb, scale=D ** -0.5, hkv=Hkv, g=G, has_scales=has_scales,
        interpret=interpret,
    )
    out5 = out[:, :rows].reshape(B, Hkv, G, Hkv, D)
    res = jnp.einsum("bhgjd,hj->bhgd", out5, eye.astype(out5.dtype))
    return res.astype(q.dtype)
