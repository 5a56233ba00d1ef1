"""Pallas TPU kernel: fused decode attention over a (possibly quantized) KV cache.

No reference analogue (the torch reference never manages attention or caches,
SURVEY.md §5.7) — this is the TPU serving path's flash-decode kernel. The
unfused XLA decode attention emits ~6 HBM-round-tripping intermediates per
layer (f32 logits, scale mul, mask add, softmax, probs mul, cast), which made
batch>1 long-context decode op-overhead-bound on v5e. This kernel reads the
raw cache payload + per-slot scales ONCE and writes only the attention
output.

Design (v5e-validated constraints):

- **Head-group blocking**: each grid instance (b, head-group) owns
  `HG = 512 // head_dim` kv heads, so its cache block is [S, HG*D = 512
  lanes] — contiguous 512-byte rows in HBM (efficient DMA even for the
  common D=64 case, which a per-head [S, 64] block would stream as 64-byte
  strided rows) and a full-width MXU contraction.
- **Block-diagonal queries**: the group's GQA queries land in a
  [HG*G, HG*D] block-diagonal matrix (head i's rows occupy lane slice
  i*D:(i+1)*D, zeros elsewhere), so ONE dot against the packed [S, HG*D]
  keys yields every head's logits — the zero lanes cancel cross-head terms
  exactly. The same trick runs probs @ values; the per-head output slices
  are extracted outside the kernel (tiny [B, Hq, HG*D] array). The zero
  padding spends HG× MXU flops, irrelevant here: decode attention is HBM
  bandwidth-bound.
- **Quantized caches**: the int8 payload feeds the MXU raw; per-slot scales
  factor out of the contractions (logits *= s_k, probs *= s_v — the same
  algebra as `tensor/kv_cache.kv_read_raw`) and are expanded to per-row
  vectors in-register. Mosaic on v5e cannot cast int8->bf16 or fp8 vectors,
  so casts go int8 -> int32 -> float32 and fp8 caches fall back to XLA.
- **Per-slot positions** arrive via scalar prefetch (SMEM), so continuous
  batching (ragged fill levels) masks correctly: slot s is visible iff
  s <= pos[b].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["flash_decode_call"]

_NEG = -1e30
_LANES = 512  # target lane width per cache block (contiguous HBM bytes: int8)


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, *, sb, scale, hg, g):
    b = pl.program_id(0)
    pos = pos_ref[b]
    M, KD = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[1]
    nchunks = S // sb
    rows = hg * g  # real (non-padding) query rows

    # Contract in the query dtype (bf16 on TPU: full MXU rate — f32 dots
    # measured 2.8x slower end-to-end; accumulation stays f32). This matches
    # the XLA einsum path, which also feeds bf16 operands to the MXU.
    dot_dtype = q_ref.dtype
    qf = q_ref[0, 0]  # [M, KD] block-diagonal

    def expand_rows(s_ref, c):
        # [HG, sb] per-head scale rows -> [M, sb] (head i covers rows
        # i*g..(i+1)*g, padding rows get ones); static python loop, VPU
        # broadcasts only.
        parts = [
            jnp.broadcast_to(s_ref[0, i, c * sb : (c + 1) * sb][None, :], (g, sb))
            for i in range(hg)
        ]
        if M != rows:
            parts.append(jnp.ones((M - rows, sb), jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def load(ref, c):
        # int8 payload -> dot dtype; Mosaic v5e cannot cast int8->bf16
        # directly, so the chain is int8 -> int32 -> f32 (-> bf16).
        t = ref[0, c * sb : (c + 1) * sb, 0, :]
        if t.dtype == jnp.int8:
            t = t.astype(jnp.int32).astype(jnp.float32)
        return t.astype(dot_dtype)  # [sb, KD]

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

    acc = jnp.zeros((M, KD), jnp.float32)
    for c in range(nchunks):
        pc = p[:, c * sb : (c + 1) * sb]
        if vs_ref is not None:
            pc = pc * expand_rows(vs_ref, c)
        acc = acc + jax.lax.dot_general(
            pc.astype(dot_dtype), load(v_ref, c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc


@functools.partial(
    jax.jit, static_argnames=("sb", "scale", "hg", "g", "has_scales", "interpret")
)
def _call(qbd, k, v, ks, vs, pos, *, sb, scale, hg, g, has_scales, interpret=False):
    B, NG, M, KD = qbd.shape
    S = k.shape[1]
    kernel = functools.partial(_kernel, sb=sb, scale=scale, hg=hg, g=g)
    if not has_scales:
        kernel = functools.partial(
            lambda pr, qr, kr, vr, o, **kw: _kernel(pr, qr, kr, vr, None, None, o, **kw),
            sb=sb, scale=scale, hg=hg, g=g,
        )

    # Index maps take the scalar-prefetch ref as a trailing argument.
    in_specs = [
        pl.BlockSpec((1, 1, M, KD), lambda b, j, *_: (b, j, 0, 0)),
        pl.BlockSpec((1, S, 1, KD), lambda b, j, *_: (b, 0, j, 0)),
        pl.BlockSpec((1, S, 1, KD), lambda b, j, *_: (b, 0, j, 0)),
    ]
    args = [qbd, k, v]
    if has_scales:
        in_specs += [
            pl.BlockSpec((1, hg, S), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((1, hg, S), lambda b, j, *_: (b, j, 0)),
        ]
        args += [ks, vs]

    payload = S * KD * k.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NG),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, M, KD), lambda b, j, *_: (b, j, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NG, M, KD), jnp.float32),
        interpret=interpret,
        # The XLA default scoped-vmem limit (16 MiB) is conservative; v5e has
        # 128 MiB physical VMEM. Double-buffered bf16 cache blocks at S=2048
        # need ~16.1 MiB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NG * M * S * KD,
            bytes_accessed=B * NG * (2 * payload + M * KD * 8 + (8 * hg * S if has_scales else 0)),
            transcendentals=B * NG * M * S,
        ),
    )(pos, *args)


def flash_decode_call(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_scale: Optional[jnp.ndarray],
    v_scale: Optional[jnp.ndarray],
    positions: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Decode attention out[b,h,g,:] = softmax-weighted sum over cache slots.

    q: [B, Hkv, G, D] queries grouped by shared kv head; k/v: [B, S, Hkv, D]
    raw cache payload (int8/bf16/f32); k_scale/v_scale: [B, S, Hkv, 1] f32
    per-slot scales or None (float cache); positions: [B] int32 — slot s
    attends iff s <= positions[b]. Returns [B, Hkv, G, D] in q.dtype, or None
    when the shapes/dtypes are outside the kernel's envelope (caller falls
    back to the XLA einsum path).
    """
    B, Hkv, G, D = q.shape
    S = k.shape[1]
    if D % 64 != 0 or S % 128 != 0:
        return None
    if k.dtype not in (jnp.int8, jnp.bfloat16, jnp.float32):
        return None  # fp8: Mosaic v5e has no fp8 vector casts
    hg = max(1, _LANES // D)
    while Hkv % hg:
        hg //= 2
    kd = hg * D
    # Cache block + its double buffer must fit VMEM next to f32 transients
    # (64 MiB scoped limit set below; leave half for transients/spills).
    if 4 * S * kd * k.dtype.itemsize > 32 * 1024 * 1024:
        return None
    sb = next((c for c in (512, 256, 128) if S % c == 0), None)
    if sb is None:
        return None
    ng = Hkv // hg
    rows = hg * G
    m_pad = -rows % 8

    # Block-diagonal queries: [B, NG, rows, KD] with head i of each group in
    # lane slice i*D:(i+1)*D. eye() placement keeps this one fused einsum.
    # Stays in q.dtype so the kernel contracts at full MXU rate (bf16).
    q6 = q.reshape(B, ng, hg, G, D)
    eye = jnp.eye(hg, dtype=q.dtype)
    qbd = jnp.einsum("bnigd,ij->bnigjd", q6, eye).reshape(B, ng, rows, kd)
    if m_pad:
        qbd = jnp.pad(qbd, ((0, 0), (0, 0), (0, m_pad), (0, 0)))

    k4 = k.reshape(B, S, ng, kd)
    v4 = v.reshape(B, S, ng, kd)
    has_scales = k_scale is not None
    ks = vs = None
    if has_scales:
        # [B, S, Hkv, 1] -> [B, Hkv, S] (lane dim along S).
        ks = jnp.transpose(k_scale[..., 0], (0, 2, 1))
        vs = jnp.transpose(v_scale[..., 0], (0, 2, 1))
    out = _call(
        qbd, k4, v4, ks, vs, positions.astype(jnp.int32),
        sb=sb, scale=D ** -0.5, hg=hg, g=G, has_scales=has_scales,
        interpret=interpret,
    )
    # Extract each head's diagonal lane slice: [B, NG, rows, KD] -> [B, Hkv, G, D].
    out6 = out[:, :, :rows].reshape(B, ng, hg, G, hg, D)
    res = jnp.einsum("bnigjd,ij->bnigd", out6, eye).reshape(B, Hkv, G, D)
    return res.astype(q.dtype)
