"""Pallas TPU kernel: fused int4/int2 group-wise dequant matmul.

TPU-native replacement for the reference's AWQ/Marlin CUDA kernels
(`library/extensions/cuda/awq/v2/gemm_cuda.cu`, `marlin_cuda_kernel.cu`).
XLA cannot fuse a nibble-unpack into a matmul operand read — the unpacked
copy would be materialized in HBM, wasting the 4x footprint advantage. This
kernel streams the *packed* bytes to VMEM and unpacks in-register.

Two design decisions carry the performance (measured on v5e, M=8,
K=4096, N=14336: 91 us vs 454 us for the XLA unpack+matmul fallback and
162 us for the bf16 baseline):

1. **Split-half packed layout** (the analogue of the marlin/AWQ permuted
   layouts): `packed[n, j] = codes[n, j] | (codes[n, j + K/2] << 4)`, so
   unpacking a 128-lane chunk is one shift or mask on int32 — no interleave,
   no transpose. (Mosaic cannot legalize shifts on uint8 vectors; the int32
   upcast is required.) Generalized to wider storage words: the **w16
   layout** packs 4 int4 codes per int16 word (`word[n, j]` holds
   `codes[n, j + p*K/4]` in bits 4p..4p+3) — same nibbles, 2-byte DMA
   elements. Measured ~3% faster end-to-end on v5e decode (RESULTS.md
   "Packed-payload DMA element width"), so w16 is the default int4 layout
   where `(K/4) % 128 == 0`; the payload dtype (uint8 vs int16) selects the
   in-kernel unpack arithmetic.

2. **Group-factored dequantization**: instead of dequantizing every weight
   element (`(c*s - z)` = ~6 VPU ops/value, which made a naive kernel
   VPU-bound at 283 us), use

       y = sum_g s_g * (x_g @ c_g^T) - (sum_k x_gk) * z_g

   so raw codes go straight to the MXU and the per-group scale/shift apply
   to the [M, BN] *output* tile — 3 VPU ops/value (cast-shift-cast).
   Scales/shifts are stored transposed ([G, N]) so the per-group row slice
   broadcasts over outputs without an in-kernel transpose.

This layout lives only in device memory: serialization always goes through
the kernel-agnostic grouped layout (same rule as the reference,
`tensor/weights/qbytes.py:211-223`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config


__all__ = [
    "qbits_matmul_kernel_call",
    "qbits_int8_matmul_kernel_call",
    "pack_split_half",
    "pack_w16",
    "pack_for_kernel",
    "unpack_split_half",
]

_CHUNK = 128  # lanes per unpacked MXU contraction

# A/B override for the in-kernel dot dtype (None = auto: bf16 inputs dot in
# bf16, f32 inputs in f32). Benchmarks flip this to isolate MXU-rate effects
# within one session (tunnel sessions have additive timing offsets, so only
# same-session comparisons are trustworthy — RESULTS.md). TRACE-TIME knob:
# already-compiled programs keep the value they were traced with.
_FORCE_DOT_DTYPE = None


def pack_split_half(codes: jnp.ndarray, bits: int = 4, k_shards: int = 1) -> jnp.ndarray:
    """Pack uint8 codes [N, K] into the split-half layout [N, K * bits / 8].

    With `k_shards` = s > 1 the K axis is first split into s contiguous
    blocks and each block is packed independently (block-local layout):
    packed columns [b*Kp/s, (b+1)*Kp/s) form a complete standalone layout of
    K block b. This is what makes row-parallel (K) tensor sharding a plain
    column shard of the payload — each device owns whole blocks.
    """
    if k_shards > 1:
        N, K = codes.shape
        kb = K // k_shards
        return jnp.concatenate(
            [pack_split_half(codes[:, b * kb : (b + 1) * kb], bits) for b in range(k_shards)],
            axis=1,
        )
    N, K = codes.shape
    codes = codes.astype(jnp.uint8)
    if bits == 4:
        half = K // 2
        return codes[:, :half] | (codes[:, half:] << 4)
    if bits == 2:
        q = K // 4
        return (
            codes[:, :q]
            | (codes[:, q : 2 * q] << 2)
            | (codes[:, 2 * q : 3 * q] << 4)
            | (codes[:, 3 * q :] << 6)
        )
    raise ValueError(f"bits must be 2 or 4, got {bits}")


def pack_w16(codes: jnp.ndarray, bits: int = 4, k_shards: int = 1) -> jnp.ndarray:
    """Pack uint8 codes [N, K] into the w16 layout [N, K*bits/16] int16:
    word j holds codes[:, j + p*(K*bits/16)] in bits `bits*p`. With
    `k_shards` > 1, block-local per contiguous K block (see pack_split_half)."""
    if k_shards > 1:
        N, K = codes.shape
        kb = K // k_shards
        return jnp.concatenate(
            [pack_w16(codes[:, b * kb : (b + 1) * kb], bits) for b in range(k_shards)],
            axis=1,
        )
    N, K = codes.shape
    vals = 16 // bits
    W = K // vals
    acc = jnp.zeros((N, W), jnp.int32)
    for p in range(vals):
        acc = acc | (codes[:, p * W : (p + 1) * W].astype(jnp.int32) << (bits * p))
    return acc.astype(jnp.int16)


def _word_vals(packed_dtype, bits: int) -> int:
    """Codes per storage word (2 for u8/int4, 4 for w16/int4, ...)."""
    return (8 * jnp.dtype(packed_dtype).itemsize) // bits


def pack_for_kernel(codes: jnp.ndarray, bits: int, k_shards: int = 1) -> jnp.ndarray:
    """Pick the fastest kernel layout for these codes: w16 when the per-part
    width stays 128-lane aligned (~3% faster decode, RESULTS.md), else the
    uint8 split-half baseline. Layout checks are per K block (`k_shards`)."""
    K = codes.shape[1]
    if bits == 4 and (K // (4 * k_shards)) % _CHUNK == 0:
        return pack_w16(codes, bits, k_shards)
    return pack_split_half(codes, bits, k_shards)


def unpack_split_half(packed: jnp.ndarray, bits: int, k: int, k_shards: int = 1) -> jnp.ndarray:
    """Inverse of `pack_split_half` / `pack_w16` (testing / fallback path);
    the storage dtype selects the layout."""
    if k_shards > 1:
        Kp = packed.shape[1]
        kpb = Kp // k_shards
        return jnp.concatenate(
            [
                unpack_split_half(packed[:, b * kpb : (b + 1) * kpb], bits, k // k_shards)
                for b in range(k_shards)
            ],
            axis=1,
        )
    if packed.dtype == jnp.int16:
        vals = 16 // bits
        w = packed.astype(jnp.int32)  # sign-extends: mask every part
        mask = jnp.int32(2**bits - 1)
        parts = [((w >> (bits * i)) & mask).astype(jnp.uint8) for i in range(vals)]
        return jnp.concatenate(parts, axis=1)[:, :k]
    packed = packed.astype(jnp.uint8)
    vals = 8 // bits
    mask = jnp.uint8(2**bits - 1)
    parts = [(packed >> (bits * i)) & mask for i in range(vals)]
    return jnp.concatenate(parts, axis=1)[:, :k]


def _unpack_part(b32, part, bits, vals, mask, unsigned=True):
    """Extract nibble/crumb `part` from word-widened int32 registers. For
    u8-origin words (`unsigned`: zero-extended widen) the top part needs no
    mask: after `>> (bits * (vals-1))` on a value < 256 nothing sits above
    bit bits-1 (verified numerics-identical in
    bench/qbits_decode_ablation_bench.py). int16-origin words sign-extend,
    so every shifted part is masked."""
    if part == 0:
        return b32 & mask
    if unsigned and part == vals - 1:
        return b32 >> (bits * part)
    return (b32 >> (bits * part)) & mask


def _kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, k_shards):
    M = x_ref.shape[0]
    BN = p_ref.shape[0]
    Kpacked = p_ref.shape[1]
    unsigned = p_ref.dtype == jnp.uint8
    vals = _word_vals(p_ref.dtype, bits)
    mask = 2**bits - 1
    nchunks = Kpacked // _CHUNK
    # Block-local layout: packed column j in K block b = j // kp_b, local
    # column jl = j % kp_b, part p holds element (b*vals + p) * kp_b + jl
    # (elements per part per block == packed columns per block == kp_b).
    kp_b = Kpacked // k_shards

    # bf16 inputs dot in bf16 (int4 codes are exact in bf16 and the MXU
    # accumulates f32, so the numerics are IDENTICAL to f32 dots of the same
    # bf16 values — but the MXU runs at its full bf16 rate). f32 inputs keep
    # f32 dots (casting x would lose mantissa bits).
    dot_dtype = _FORCE_DOT_DTYPE or (
        jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    )
    x = x_ref[:].astype(dot_dtype)
    y = jnp.zeros((M, BN), jnp.float32)
    for c in range(nchunks):
        # Read + widen each packed byte block ONCE; both nibble parts come
        # from the same int32 registers.
        b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
        blk, jl0 = divmod(c * _CHUNK, kp_b)
        for part in range(vals):
            raw = _unpack_part(b32, part, bits, vals, mask, unsigned)
            codes = raw.astype(dot_dtype)
            k0 = (blk * vals + part) * kp_b + jl0
            g = k0 // group_size
            xg = x[:, k0 : k0 + _CHUNK]
            pd = jax.lax.dot_general(
                xg, codes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            y += pd * s_ref[g : g + 1, :] - xsum * z_ref[g : g + 1, :]
    out_ref[:] = y


def _prefill_kernel(*refs, group_size, vals, bits, kp_b, k_axis=2):
    """Prefill-shaped (large-M) variant: M/N/K-tiled grid instead of the
    decode kernel's VMEM-resident x. The word layouts pack position j with
    positions j + p*(K_block/vals) inside each of the `k_shards` K blocks
    (kp_b = packed columns per block), so one packed K-tile touches `vals`
    x tiles (2 for u8/int4, 4 for u8/int2 and w16/int4 — each arrives as
    its own ref); the output block accumulates across the K grid dimension.
    Scale/shift refs carry ALL G group rows (they are tiny; Mosaic rejects
    sub-8-row blocks) and the per-chunk row is selected dynamically from the
    k program id.
    """
    x_refs = refs[:vals]
    p_ref, s_ref, z_ref, out_ref = refs[vals:]
    unsigned = p_ref.dtype == jnp.uint8
    mask = 2**bits - 1
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    BM = x_refs[0].shape[0]
    BN = p_ref.shape[0]
    bkp = p_ref.shape[1]
    G = s_ref.shape[0]
    integer = x_refs[0].dtype == jnp.int8  # W4A8: int8 x int4/int2 on the int MXU
    if integer:
        dot_dtype, acc_dtype = jnp.int8, jnp.int32
        xs = [r[:] for r in x_refs]
    else:
        dot_dtype = _FORCE_DOT_DTYPE or (
            jnp.bfloat16 if x_refs[0].dtype == jnp.bfloat16 else jnp.float32
        )
        acc_dtype = jnp.float32
        xs = [r[:].astype(dot_dtype) for r in x_refs]
    acc = jnp.zeros((BM, BN), jnp.float32)
    # K tiles never straddle K blocks (bkp | kp_b by gating), so the block
    # index is constant per program: blk = (k*bkp) // kp_b.
    blk = (k * bkp) // kp_b
    jl_base = k * bkp - blk * kp_b
    for c in range(bkp // _CHUNK):
        b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
        for part, x in enumerate(xs):
            raw = _unpack_part(b32, part, bits, vals, mask, unsigned)
            codes = raw.astype(dot_dtype)
            xg = x[:, c * _CHUNK : (c + 1) * _CHUNK]
            pd = jax.lax.dot_general(
                xg, codes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            xsum = jnp.sum(xg.astype(acc_dtype), axis=1, keepdims=True)
            # Global element offset of this chunk: (blk*vals + part)*kp_b + jl.
            row = ((blk * vals + part) * kp_b + jl_base + c * _CHUNK) // group_size
            s = s_ref[pl.ds(row, 1), :]
            z = z_ref[pl.ds(row, 1), :]
            acc += pd.astype(jnp.float32) * s - xsum.astype(jnp.float32) * z
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bm", "bn", "bkp", "vals", "bits", "k_shards", "interpret"),
)
def _prefill_call(
    x, packed, scale_t, shift_t, *, group_size, bm, bn, bkp, vals, bits, k_shards=1, interpret=False
):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    kp_b = Kpacked // k_shards  # packed columns (== elements per part) per K block
    rb = kp_b // bkp  # K grid programs per block
    kernel = functools.partial(
        _prefill_kernel, group_size=group_size, vals=vals, bits=bits, kp_b=kp_b
    )
    # Part p's x K-tiles: x element offset of grid step k for part p is
    # (blk*vals + p) * kp_b + jl, blk = k // rb, jl = (k % rb) * bkp.
    x_specs = [
        pl.BlockSpec(
            (bm, bkp),
            lambda i, j, k, p=p: (i, (k // rb * vals + p) * rb + k % rb),
            memory_space=pltpu.VMEM,
        )
        for p in range(vals)
    ]
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, Kpacked // bkp),
        in_specs=x_specs + [
            pl.BlockSpec((bn, bkp), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked * packed.dtype.itemsize
            + M * K * x.dtype.itemsize + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(*([x] * vals), packed, scale_t, shift_t)


def _prefill_route(x2, packed, scale_t, shift_t, *, bits, gs, K, k_shards=1, interpret=False):
    """Shared M>_MAX_M dispatch to `_prefill_call` (float or int8 x).
    Returns the [M, N] float32 output or None when outside the envelope."""
    M = x2.shape[0]
    N, Kpacked = packed.shape
    vals = _word_vals(packed.dtype, bits)
    if gs == K:
        return None  # per-tensor/per-axis: G rows too few for a VMEM block
    if bits == 2 and M > 1024:
        # Measured on v5e (K=4096, N=14336, same-session): int2 wins at
        # M<=1024 (47.0 vs 41.6 TF/s) but LOSES at M=2048 (75.4 vs 85.1) —
        # at large M the matmul is MXU-bound and the fallback's one-time
        # unpack amortizes, while the kernel's 4-part VPU unpack does not.
        return None
    # Measured on v5e (K=4096, N=14336): the largest K-tile wins until
    # VMEM pressure bites — bkp=2048 is best at M<=1024 (62.7 vs 54.8
    # TF/s at M=1024), bkp=1024 at larger M (89.3 vs 78.4 at M=2048).
    # K tiles must not straddle block-local K blocks: bkp | Kpacked/k_shards.
    kp_b = Kpacked // k_shards
    bm = 256
    G = scale_t.shape[0]

    def vmem_est(bn_c, bkp_c):
        # Double-buffered input blocks + the output accumulator. Budget is
        # conservative vs the 16 MB scoped limit (K=8192 shapes picked
        # bkp=2048 x bn=1024 before this gate and hit a 19 MB stack OOM in
        # the Mosaic compile — e.g. the gathered-MoE down_proj).
        x_b = vals * bm * bkp_c * x2.dtype.itemsize
        w_b = bn_c * bkp_c * packed.dtype.itemsize
        s_b = 2 * G * bn_c * 4
        return 2 * (x_b + w_b + s_b) + bm * bn_c * 4

    bkp_cands = (2048, 1024, 512, 256, 128) if M <= 1024 else (1024, 512, 256, 128)
    bkp = bn = None
    for bkp_c in bkp_cands:
        if kp_b % bkp_c:
            continue
        for bn_c in (1024, 512, 256, 128):
            if N % bn_c == 0 and vmem_est(bn_c, bkp_c) <= 12 * 1024 * 1024:
                bkp, bn = bkp_c, bn_c
                break
        if bkp is not None:
            break
    if bkp is None or bn is None:
        return None
    m_pad = -M % bm
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _prefill_call(
        x2, packed,
        scale_t.astype(jnp.float32), shift_t.astype(jnp.float32),
        group_size=gs, bm=bm, bn=bn, bkp=bkp, vals=vals, bits=bits,
        k_shards=k_shards, interpret=interpret,
    )
    return out[:M] if m_pad else out


# int8-dot crossover: the isolated MXU rate A/B (bench/int8_mxu_rate_bench.py)
# measures int8xint8 at 1.05x bf16 at M=1024 but 1.27x at M=2048 / 1.44x at
# M=4096; below 2048 the integer-rate margin is too thin to beat the exact
# per-group kernel, which keeps those shapes.
#
# (A first attempt ran the requant at the XLA level — unpack -> dequant ->
# per-channel int8 -> one big dot. Measured 0.72x of bf16 at 8B/M=2048 vs
# the exact kernel's 0.94x: XLA materializes the [N, K] f32 dequant
# intermediate (235 MB for the down_proj) instead of fusing it into the int8
# producer. The requant lives INSIDE the Pallas kernel below instead.)
_INT8_DOT_MIN_M = 2048


def _int8pc_kernel(*refs, gs, vals, bits, kp_b, nk):
    """W4A8 prefill with PER-CHANNEL int8 requantization in-kernel.

    The exact int8 kernel (`_prefill_kernel` with int8 x) must rescale its
    i32 partials every `gs`-wide chunk (group-wise scales), which caps its
    dots at K=128 and spends 3 VPU ops per output element per chunk — the
    measured gap to the raw int8 MXU rate (0.94x vs 1.27x of bf16 at
    M=2048). Re-quantizing each weight tile to per-channel int8 as it is
    unpacked (round(code * s_g/s8 - z_g/s8), one VPU pass over WEIGHT-sized
    data) makes the i32 accumulation valid across the whole K tile AND the
    whole K grid: full-bkp int8 dots, i32 scratch accumulator, one f32
    `* s8[n]` epilogue at the last K step. Numerics match the
    `_int8_requant_dot` contract: a per-channel int8 step ~8x finer than the
    coarsest group's int4 step (fidelity-gated in
    tests/ops/test_pallas_kernels.py).
    """
    x_refs = refs[:vals]
    p_ref, rs_ref, rz_ref, s8_ref, out_ref = refs[vals : vals + 5]
    acc_ref = refs[vals + 5]
    k = pl.program_id(2)
    BM = x_refs[0].shape[0]
    BN = p_ref.shape[0]
    bkp = p_ref.shape[1]
    unsigned = p_ref.dtype == jnp.uint8
    mask = 2**bits - 1

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blk = (k * bkp) // kp_b
    jl_base = k * bkp - blk * kp_b
    nseg = max(bkp // gs, 1)
    seg_w = min(gs, bkp)
    b32 = p_ref[:].astype(jnp.int32)
    acc = jnp.zeros((BM, BN), jnp.int32)
    # Group-column extraction: `rs_ref[:, pl.ds(g, 1)]` would be a
    # dynamic-start lane-dim slice, which Mosaic rejects ("cannot statically
    # prove that index in dimension 1 is a multiple of 128" — hit on real
    # hardware, invisible in interpret mode). Select the column with a
    # masked lane reduction instead: G is tiny (K/gs <= ~128 lanes), so the
    # [BN, G] pass is noise next to the [BM, BN, bkp] dot.
    rs_full = rs_ref[:].astype(jnp.float32)  # [BN, G]
    rz_full = rz_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rs_full.shape[1]), 1)
    for part in range(vals):
        raw = _unpack_part(b32, part, bits, vals, mask, unsigned).astype(jnp.float32)
        k0p = (blk * vals + part) * kp_b + jl_base
        segs = []
        for s_i in range(nseg):
            g = (k0p + s_i * seg_w) // gs
            sel = (col == g).astype(jnp.float32)
            rs = jnp.sum(rs_full * sel, axis=1, keepdims=True)  # [BN, 1]
            rz = jnp.sum(rz_full * sel, axis=1, keepdims=True)
            seg = raw[:, s_i * seg_w : (s_i + 1) * seg_w] * rs - rz
            segs.append(seg)
        c8f = jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]
        c8 = jnp.clip(jnp.round(c8f), -127, 127).astype(jnp.int8)
        acc += jax.lax.dot_general(
            x_refs[part][:], c8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    acc_ref[:] += acc

    @pl.when(k == nk - 1)
    def _fin():
        out_ref[:] = acc_ref[:].astype(jnp.float32) * s8_ref[0:1, :]


@functools.partial(
    jax.jit,
    static_argnames=("gs", "bm", "bn", "bkp", "vals", "bits", "k_shards", "interpret"),
)
def _int8pc_call(
    x, packed, scale_t, shift_t, *, gs, bm, bn, bkp, vals, bits, k_shards=1, interpret=False
):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    kp_b = Kpacked // k_shards
    rb = kp_b // bkp
    nk = Kpacked // bkp
    s = scale_t.astype(jnp.float32)  # [G, N]
    z = shift_t.astype(jnp.float32)
    qmax = float(2**bits - 1)
    amax = jnp.max(jnp.maximum(jnp.abs(z), jnp.abs(s * qmax - z)), axis=0)  # [N]
    s8 = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    rs2 = (s / s8[None, :]).T  # [N, G]
    rz2 = (z / s8[None, :]).T
    s8p = jnp.broadcast_to(s8[None, :], (8, N))  # >=8 sublanes for Mosaic
    kernel = functools.partial(
        _int8pc_kernel, gs=gs, vals=vals, bits=bits, kp_b=kp_b, nk=nk
    )
    x_specs = [
        pl.BlockSpec(
            (bm, bkp),
            lambda i, j, k, p=p: (i, (k // rb * vals + p) * rb + k % rb),
            memory_space=pltpu.VMEM,
        )
        for p in range(vals)
    ]
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, nk),
        in_specs=x_specs + [
            pl.BlockSpec((bn, bkp), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, G), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, G), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked * packed.dtype.itemsize
            + M * K + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(*([x] * vals), packed, rs2, rz2, s8p)


def _int8pc_route(x2, packed, scale_t, shift_t, *, bits, gs, K, k_shards=1, interpret=False):
    """M>=_INT8_DOT_MIN_M dispatch to the per-channel int8 prefill kernel.
    Returns the [M, N] f32 output or None when outside the envelope."""
    M = x2.shape[0]
    N, Kpacked = packed.shape
    vals = _word_vals(packed.dtype, bits)
    if gs == K or gs % _CHUNK != 0:
        return None
    kp_b = Kpacked // k_shards
    G = scale_t.shape[0]
    bm = 256

    def vmem_est(bn_c, bkp_c):
        x_b = vals * bm * bkp_c  # int8
        w_b = bn_c * bkp_c * packed.dtype.itemsize
        s_b = 2 * bn_c * G * 4 + 8 * bn_c * 4
        return 2 * (x_b + w_b + s_b) + bm * bn_c * 8  # out f32 + i32 scratch

    bkp = bn = None
    for bkp_c in (1024, 512, 256, 128):
        if kp_b % bkp_c:
            continue
        # Requant segments must align to groups: whole groups per tile, or
        # whole tiles per group (see the seg loop in _int8pc_kernel).
        if bkp_c % gs and gs % bkp_c:
            continue
        for bn_c in (1024, 512, 256, 128):
            # 6 MB budget: Mosaic's real stack allocation measured ~2.1x
            # this estimate (17.84 MB actual vs 8.6 MB estimated at
            # bkp=bn=1024, K=4096 — scoped-vmem OOM on the 8B o_proj), so
            # the headroom keeps actual under the 16 MB scoped limit.
            if N % bn_c == 0 and vmem_est(bn_c, bkp_c) <= 6 * 1024 * 1024:
                bkp, bn = bkp_c, bn_c
                break
        if bkp is not None:
            break
    if bkp is None or bn is None:
        return None
    m_pad = -M % bm
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _int8pc_call(
        x2, packed, scale_t, shift_t,
        gs=gs, bm=bm, bn=bn, bkp=bkp, vals=vals, bits=bits,
        k_shards=k_shards, interpret=interpret,
    )
    return out[:M] if m_pad else out


def _int8_kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, k_shards):
    """W4A8: int8 activations x int4 codes on the integer MXU.

    Same group-factored algebra as `_kernel` but the per-chunk product runs
    as int8 x int8 -> int32 (2x the bf16 MXU rate, and no f32 casts of the
    codes — the VPU only touches the [M, BN] output tile):

        y = sx * [ sum_g s_g (xq_g @ c_g^T) - z_g * (sum_k xq_gk) ]
    """
    M = x_ref.shape[0]
    BN = p_ref.shape[0]
    Kpacked = p_ref.shape[1]
    unsigned = p_ref.dtype == jnp.uint8
    vals = _word_vals(p_ref.dtype, bits)
    mask = 2**bits - 1
    nchunks = Kpacked // _CHUNK
    kp_b = Kpacked // k_shards  # block-local layout (see _kernel)

    y = jnp.zeros((M, BN), jnp.float32)
    for part in range(vals):
        for c in range(nchunks):
            b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
            raw = _unpack_part(b32, part, bits, vals, mask, unsigned)
            codes = raw.astype(jnp.int8)  # 0..15 fits int8 exactly
            blk, jl0 = divmod(c * _CHUNK, kp_b)
            k0 = (blk * vals + part) * kp_b + jl0
            g = k0 // group_size
            xg = x_ref[:, k0 : k0 + _CHUNK]  # int8
            pd = jax.lax.dot_general(
                xg, codes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
            y += pd.astype(jnp.float32) * s_ref[g : g + 1, :] - xsum.astype(
                jnp.float32
            ) * z_ref[g : g + 1, :]
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "k_shards", "interpret"))
def _int8_call(x, packed, scale_t, shift_t, *, bits, group_size, k_shards=1, interpret=False):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    bn = _pick_bn(N, Kpacked * packed.dtype.itemsize, M, K, x.dtype.itemsize)
    kernel = functools.partial(_int8_kernel, bits=bits, group_size=group_size, k_shards=k_shards)
    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kpacked), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked * packed.dtype.itemsize
            + M * K + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed, scale_t, shift_t)


def _kernel_ok(x, packed, bits, K, gs, k_shards) -> bool:
    """Shared kernel-envelope gate (the analogue of the reference kernel
    selection constraints, `weights/qbits.py:94-138`). Block-local layout:
    every per-(block, part) segment has kp_b = Kpacked/k_shards elements;
    chunks and scale groups must not straddle segments."""
    if packed.ndim != 2 or bits not in (2, 4):
        return False
    if packed.dtype not in (jnp.uint8, jnp.int16):
        return False
    N, Kpacked = packed.shape
    if Kpacked % k_shards != 0:
        return False
    kp_b = Kpacked // k_shards
    if x.shape[-1] != K or N % 128 != 0 or kp_b % _CHUNK != 0:
        return False
    if gs == K:
        return k_shards == 1  # a single group cannot straddle K blocks
    return gs % _CHUNK == 0 and kp_b % gs == 0


def qbits_int8_matmul_kernel_call(
    x_data: jnp.ndarray,
    x_scale,
    packed: jnp.ndarray,
    scale_t: jnp.ndarray,
    shift_t: jnp.ndarray,
    bits: int,
    group_size: Optional[int],
    float_dtype,
    *,
    k_shards: int = 1,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """W4A8 fused matmul: int8 activation payload (per-tensor scale `x_scale`)
    against split-half packed sub-byte weights. Returns the FLOAT output
    (same semantics as dequantizing both operands), or None when outside the
    kernel envelope."""
    if x_data.dtype != jnp.int8:
        return None
    N, Kpacked = packed.shape if packed.ndim == 2 else (0, 0)
    vals = _word_vals(packed.dtype, bits) if packed.dtype in (jnp.uint8, jnp.int16) else 0
    K = Kpacked * vals
    gs = group_size if group_size is not None else K
    if not _kernel_ok(x_data, packed, bits, K, gs, k_shards):
        return None
    lead = x_data.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if M > _MAX_M:
        if M >= _INT8_DOT_MIN_M and config.use_w4a8_requant_dot():
            # Long prompts: in-kernel per-channel int8 requant + full-tile
            # int8 MXU dots with i32 grid accumulation (_int8pc_kernel).
            out = _int8pc_route(
                x_data.reshape(M, K), packed, scale_t, shift_t,
                bits=bits, gs=gs, K=K, k_shards=k_shards, interpret=interpret,
            )
            if out is not None:
                out = out * jnp.asarray(x_scale, jnp.float32).reshape(())
                return out.reshape(*lead, N).astype(float_dtype)
        # W4A8 prefill: same tiled kernel, int8 x int4 on the integer MXU.
        out = _prefill_route(
            x_data.reshape(M, K), packed, scale_t, shift_t,
            bits=bits, gs=gs, K=K, k_shards=k_shards, interpret=interpret,
        )
        if out is None:
            return None
        out = out * jnp.asarray(x_scale, jnp.float32).reshape(())
        return out.reshape(*lead, N).astype(float_dtype)
    x2 = x_data.reshape(M, K)
    m_pad = -M % 8
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _int8_call(
        x2, packed,
        scale_t.astype(jnp.float32), shift_t.astype(jnp.float32),
        bits=bits, group_size=gs, k_shards=k_shards, interpret=interpret,
    )
    if m_pad:
        out = out[:M]
    out = out * jnp.asarray(x_scale, jnp.float32).reshape(())
    return out.reshape(*lead, N).astype(float_dtype)


# The decode kernel keeps the whole x [M, K] in VMEM, which bounds M.
# Measured on v5e it beats the XLA unpack+matmul fallback at every M up to
# the VMEM limit (1.46x at M=64, 1.41x at 256, 1.31x at 512 — same-session
# ratios) and also beats the M/N/K-tiled prefill kernel at M=512 (38.9 vs
# 35.6 TF/s same-session), so the crossover to the tiled variant sits AT the
# VMEM limit; beyond it `_prefill_call` takes over (int4 and int2, float or
# int8 x; per-axis/per-tensor scales fall back to the XLA dequant path).
_MAX_M = 512


def _pick_bn(n: int, packed_row_bytes: int, m: int, k: int, x_itemsize: int, vmem_budget: int = 10 * 1024 * 1024) -> int:
    vals_budget = vmem_budget - 2 * m * k * x_itemsize  # x (+f32 copy)
    limit = max(vals_budget // (2 * max(packed_row_bytes, 1)), 128)
    # 1024 measured fastest on v5e (2048 regresses ~3%: less pipelining overlap).
    for cand in (1024, 512, 256, 128):
        if cand <= limit and n % cand == 0:
            return cand
    return 128


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "k_shards", "interpret"))
def _call(x, packed, scale_t, shift_t, *, bits, group_size, k_shards=1, interpret=False):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    bn = _pick_bn(N, Kpacked * packed.dtype.itemsize, M, K, x.dtype.itemsize)
    kernel = functools.partial(_kernel, bits=bits, group_size=group_size, k_shards=k_shards)
    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Kpacked), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked * packed.dtype.itemsize
            + M * K * x.dtype.itemsize + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed, scale_t, shift_t)


def qbits_matmul_kernel_call(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale_t: jnp.ndarray,
    shift_t: jnp.ndarray,
    bits: int,
    group_size: Optional[int],
    *,
    k_shards: int = 1,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """y[..., N] = x[..., K] @ dequant(packed).T with split-half packed weights.

    `scale_t`/`shift_t` are TRANSPOSED [G, N] float32 with float-shift
    semantics (`deq = scale * code - shift`). Returns None if constraints
    fail (caller falls back to the XLA dequant path) — the analogue of the
    reference kernel gating (`weights/qbits.py:94-138`).
    """
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    N, Kpacked = packed.shape if packed.ndim == 2 else (0, 0)
    vals = _word_vals(packed.dtype, bits) if packed.dtype in (jnp.uint8, jnp.int16) else 0
    K = Kpacked * vals
    gs = group_size if group_size is not None else K
    if not _kernel_ok(x, packed, bits, K, gs, k_shards):
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if M > _MAX_M:
        # Prefill-shaped: the M/N/K-tiled variant (x streamed in tiles
        # instead of VMEM-resident).
        out = _prefill_route(
            x.reshape(M, K), packed, scale_t, shift_t,
            bits=bits, gs=gs, K=K, k_shards=k_shards, interpret=interpret,
        )
        if out is None:
            return None
        return out.reshape(*lead, N).astype(x.dtype)
    x2 = x.reshape(M, K)
    m_pad = -M % 8
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _call(
        x2,
        packed,
        scale_t.astype(jnp.float32),
        shift_t.astype(jnp.float32),
        bits=bits,
        group_size=gs,
        k_shards=k_shards,
        interpret=interpret,
    )
    if m_pad:
        out = out[:M]
    return out.reshape(*lead, N).astype(x.dtype)
