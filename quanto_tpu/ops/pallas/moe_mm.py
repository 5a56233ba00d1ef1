"""Stacked-expert MoE matmul kernels: the expert index lives INSIDE the
Pallas grid, so per-expert weights are DMA'd straight from the stacked
[E, ...] HBM array — never sliced at the XLA level.

Why this exists (round-3 root cause, commit 1273431): feeding `data[j]`
slices of a stacked expert array into per-expert `pallas_call`s forces XLA
to materialize each slice — an HBM->HBM copy of the full expert weights per
step that measured 2.5x the dense-mask decode time. Moving the expert
dimension into the grid's BlockSpec index maps removes the copy entirely,
and with a SCALAR-PREFETCHED routing table (`pltpu.PrefetchScalarGridSpec`)
the decode path streams ONLY the routed experts' weights: at B=1, top-2 of
8 experts, the MLP weight traffic drops 4x vs any dense dispatch.

Three entry points over stacked sub-byte weights (packed [E, N, Kp],
scales/shifts [E, G, N], same split-half/w16 layouts as `qbits_mm`):

- `qbits_moe_sel_call`: per-(token, slot) selective gemv, expert ids
  scalar-prefetched — decode when S*top_k < E.
- `qbits_moe_all_call`: every expert over all S tokens — the dense-mask
  decode math, but reading the stacked array copy-free.
- `qbits_moe_prefill_call`: batched-expert M-tiled GEMM over per-expert
  gathered token slabs [E, cap, K] — capacity-dispatch prefill.

The reference has no MoE kernels at all (its Mixtral runs through generic
per-module quantized linears, `optimum/quanto/quantize.py:55-98`); this is
TPU-native new capability sized by bench/moe_bench.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qbits_mm import (
    _CHUNK,
    _kernel,
    _kernel_ok,
    _pick_bn,
    _prefill_kernel,
    _word_vals,
)


__all__ = [
    "qbits_moe_sel_call",
    "qbits_moe_all_call",
    "qbits_moe_prefill_call",
]


def _stacked_ok(x, packed3, bits, group_size, k_shards) -> bool:
    if packed3.ndim != 3:
        return False
    E, N, Kpacked = packed3.shape
    vals = _word_vals(packed3.dtype, bits) if packed3.dtype in (jnp.uint8, jnp.int16) else 0
    if not vals:
        return False
    K = Kpacked * vals
    gs = group_size if group_size is not None else K
    # Reuse the 2D envelope gate on one expert's slice shape.
    return _kernel_ok(x, jax.ShapeDtypeStruct((N, Kpacked), packed3.dtype), bits, K, gs, k_shards)


_SEL_MAX = 32  # pair cap: the kernel computes ceil8(nsel) rows per pair
# (quadratic in nsel), free only while decode stays weight-streaming-bound —
# at 32 pairs the per-block MXU work is 4x the plain decode kernel's, still
# far under the streaming bound at sub-byte widths.


def _moe_sel_kernel(eids_ref, x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, k_shards):
    # eids_ref is consumed by the index maps. Single-row blocks violate the
    # Mosaic sublane tiling (bf16 tile is (2, 128), f32 (8, 128)), so each
    # grid step computes ALL padded pair rows (nsel rounded up to the
    # sublane multiple) against its selected expert — decode is
    # weight-streaming-bound, the extra rows are free — and the caller
    # keeps row i of step i (the diagonal).
    del eids_ref
    _kernel(
        x_ref, p_ref.at[0], s_ref.at[0], z_ref.at[0], out_ref.at[0],
        bits=bits, group_size=group_size, k_shards=k_shards,
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "k_shards", "interpret")
)
def _sel_call(x_pad, eids, packed3, scale3, shift3, *, bits, group_size, k_shards, interpret):
    nsel = eids.shape[0]
    P, K = x_pad.shape
    E, N, Kpacked = packed3.shape
    G = scale3.shape[1]
    bn = _pick_bn(N, Kpacked * packed3.dtype.itemsize, P, K, x_pad.dtype.itemsize)
    kernel = functools.partial(
        _moe_sel_kernel, bits=bits, group_size=group_size, k_shards=k_shards
    )
    # Grid order (j, i) with the PAIR index innermost: callers sort pairs by
    # expert id so duplicate experts land on adjacent i steps. NOTE: the
    # hoped-for dedup (Mosaic skipping the re-fetch when consecutive block
    # indices are equal) was MEASURED ABSENT under scalar-prefetched index
    # maps (RESULTS.md round-4 addendum: 1-unique vs 8-unique eids differ by
    # only 6%) — duplicates still stream, which is why callers gate the
    # selective path at S*top_k < E. The order is kept because it is free
    # and becomes a win if a future Mosaic adds the runtime skip.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, nsel),
        in_specs=[
            pl.BlockSpec((P, K), lambda j, i, eids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bn, Kpacked), lambda j, i, eids: (eids[i], j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, bn), lambda j, i, eids: (eids[i], 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, bn), lambda j, i, eids: (eids[i], 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, P, bn), lambda j, i, eids: (i, 0, j), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsel, P, N), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsel * P * N * K,
            bytes_accessed=nsel * N * Kpacked * packed3.dtype.itemsize
            + P * K * x_pad.dtype.itemsize + nsel * P * N * 4,
            transcendentals=0,
        ),
    )(eids, x_pad, packed3, scale3, shift3)
    idx = jnp.arange(nsel)
    return out[idx, idx, :]


def qbits_moe_sel_call(
    x_sel: jnp.ndarray,
    eids: jnp.ndarray,
    packed3: jnp.ndarray,
    scale3: jnp.ndarray,
    shift3: jnp.ndarray,
    bits: int,
    group_size: Optional[int],
    *,
    k_shards: int = 1,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """out[i] = x_sel[i] @ dequant(W[eids[i]]).T, streaming ONLY the selected
    experts' weights. x_sel [nsel, K] with nsel <= 32 (the selective decode
    regime — larger fan-outs go through the all-experts kernel); eids [nsel]
    int32; returns [nsel, N] f32 or None when outside the kernel envelope."""
    if x_sel.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    nsel = x_sel.shape[0]
    if nsel > _SEL_MAX:
        return None
    if not _stacked_ok(x_sel, packed3, bits, group_size, k_shards):
        return None
    E, N, Kpacked = packed3.shape
    vals = _word_vals(packed3.dtype, bits)
    gs = group_size if group_size is not None else Kpacked * vals
    pad = -nsel % 8
    x_pad = jnp.pad(x_sel, ((0, pad), (0, 0))) if pad else x_sel
    return _sel_call(
        x_pad, eids.astype(jnp.int32), packed3,
        scale3.astype(jnp.float32), shift3.astype(jnp.float32),
        bits=bits, group_size=gs, k_shards=k_shards, interpret=interpret,
    )


def _moe_all_kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, k_shards):
    _kernel(
        x_ref, p_ref.at[0], s_ref.at[0], z_ref.at[0], out_ref.at[0],
        bits=bits, group_size=group_size, k_shards=k_shards,
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "k_shards", "interpret")
)
def _all_call(x, packed3, scale3, shift3, *, bits, group_size, k_shards, interpret):
    S, K = x.shape
    E, N, Kpacked = packed3.shape
    G = scale3.shape[1]
    bn = _pick_bn(N, Kpacked * packed3.dtype.itemsize, S, K, x.dtype.itemsize)
    kernel = functools.partial(
        _moe_all_kernel, bits=bits, group_size=group_size, k_shards=k_shards
    )
    return pl.pallas_call(
        kernel,
        grid=(E, N // bn),
        in_specs=[
            pl.BlockSpec((S, K), lambda e, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, Kpacked), lambda e, j: (e, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, bn), lambda e, j: (e, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, bn), lambda e, j: (e, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, bn), lambda e, j: (e, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, S, N), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * S * N * K,
            bytes_accessed=E * N * Kpacked * packed3.dtype.itemsize
            + S * K * x.dtype.itemsize + E * S * N * 4,
            transcendentals=0,
        ),
    )(x, packed3, scale3, shift3)


def _moe_uniq_kernel(eids_ref, x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, k_shards):
    del eids_ref  # consumed by the index maps
    _kernel(
        x_ref, p_ref.at[0], s_ref.at[0], z_ref.at[0], out_ref.at[0],
        bits=bits, group_size=group_size, k_shards=k_shards,
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "k_shards", "interpret")
)
def _uniq_call(x, eids, packed3, scale3, shift3, *, bits, group_size, k_shards, interpret):
    """`_all_call` over U SLOTS instead of all E experts: slot u computes
    x @ dequant(W[eids[u]]).T — the unique-expert dedup route streams only
    the experts present in the (deduplicated, padded) routing table."""
    S, K = x.shape
    U = eids.shape[0]
    E, N, Kpacked = packed3.shape
    G = scale3.shape[1]
    bn = _pick_bn(N, Kpacked * packed3.dtype.itemsize, S, K, x.dtype.itemsize)
    kernel = functools.partial(
        _moe_uniq_kernel, bits=bits, group_size=group_size, k_shards=k_shards
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U, N // bn),
        in_specs=[
            pl.BlockSpec((S, K), lambda u, j, eids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bn, Kpacked), lambda u, j, eids: (eids[u], j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, bn), lambda u, j, eids: (eids[u], 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G, bn), lambda u, j, eids: (eids[u], 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, bn), lambda u, j, eids: (u, 0, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((U, S, N), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * U * S * N * K,
            bytes_accessed=U * N * Kpacked * packed3.dtype.itemsize
            + S * K * x.dtype.itemsize + U * S * N * 4,
            transcendentals=0,
        ),
    )(eids, x, packed3, scale3, shift3)


def qbits_moe_all_call(
    x: jnp.ndarray,
    packed3: jnp.ndarray,
    scale3: jnp.ndarray,
    shift3: jnp.ndarray,
    bits: int,
    group_size: Optional[int],
    *,
    k_shards: int = 1,
    interpret: bool = False,
    eids: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """out[e] = x @ dequant(W[e]).T for every expert — the dense-mask decode
    math over the stacked array, copy-free. x [S, K] (S a multiple of 8,
    bounded like the decode kernel's _MAX_M: x and the [1, S, bn] out block
    are VMEM-resident, so large S must go through the M-tiled
    `qbits_moe_prefill_call` instead); returns [E, S, N] f32 or None.

    With `eids` [U] int32 (scalar-prefetched): the unique-expert dedup
    route — slot u computes against W[eids[u]], streaming only U expert
    payloads; returns [U, S, N] f32."""
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if x.shape[0] % 8 or x.shape[0] > 512:
        return None
    if not _stacked_ok(x, packed3, bits, group_size, k_shards):
        return None
    E, N, Kpacked = packed3.shape
    vals = _word_vals(packed3.dtype, bits)
    gs = group_size if group_size is not None else Kpacked * vals
    if eids is not None:
        return _uniq_call(
            x, eids.astype(jnp.int32), packed3,
            scale3.astype(jnp.float32), shift3.astype(jnp.float32),
            bits=bits, group_size=gs, k_shards=k_shards, interpret=interpret,
        )
    return _all_call(
        x, packed3,
        scale3.astype(jnp.float32), shift3.astype(jnp.float32),
        bits=bits, group_size=gs, k_shards=k_shards, interpret=interpret,
    )


def _moe_prefill_kernel(*refs, group_size, vals, bits, kp_b):
    flat = [r.at[0] for r in refs[: vals + 3]] + [refs[vals + 3].at[0]]
    _prefill_kernel(
        *flat, group_size=group_size, vals=vals, bits=bits, kp_b=kp_b, k_axis=3
    )


def _moe_prefill_uniq_kernel(eids_ref, *refs, group_size, vals, bits, kp_b):
    del eids_ref
    _moe_prefill_kernel(*refs, group_size=group_size, vals=vals, bits=bits, kp_b=kp_b)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bm", "bn", "bkp", "vals", "bits", "k_shards", "interpret"),
)
def _moe_prefill_call(
    xg, packed3, scale3, shift3, *, group_size, bm, bn, bkp, vals, bits, k_shards, interpret,
    eids=None,
):
    E, M, K = xg.shape
    _, N, Kpacked = packed3.shape
    G = scale3.shape[1]
    kp_b = Kpacked // k_shards
    rb = kp_b // bkp
    x_specs = [
        pl.BlockSpec(
            (1, bm, bkp),
            lambda e, i, j, k, *pf, p=p: (e, i, (k // rb * vals + p) * rb + k % rb),
            memory_space=pltpu.VMEM,
        )
        for p in range(vals)
    ]
    # Weight-side index maps: slot -> expert via the scalar-prefetched table
    # on the uniq route, identity otherwise.
    we = (lambda e, i, j, k, eids: eids[e]) if eids is not None else (lambda e, i, j, k: e)
    w_specs = [
        pl.BlockSpec(
            (1, bn, bkp),
            (lambda e, i, j, k, *pf: (we(e, i, j, k, *pf), j, k)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G, bn),
            (lambda e, i, j, k, *pf: (we(e, i, j, k, *pf), 0, j)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G, bn),
            (lambda e, i, j, k, *pf: (we(e, i, j, k, *pf), 0, j)),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_spec = pl.BlockSpec(
        (1, bm, bn), lambda e, i, j, k, *pf: (e, i, j), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * E * M * N * K,
        bytes_accessed=E * N * Kpacked * packed3.dtype.itemsize
        + E * M * K * xg.dtype.itemsize + E * M * N * 4,
        transcendentals=0,
    )
    if eids is not None:
        kernel = functools.partial(
            _moe_prefill_uniq_kernel, group_size=group_size, vals=vals, bits=bits, kp_b=kp_b
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E, M // bm, N // bn, Kpacked // bkp),
            in_specs=x_specs + w_specs,
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, M, N), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
        )(eids, *([xg] * vals), packed3, scale3, shift3)
    kernel = functools.partial(
        _moe_prefill_kernel, group_size=group_size, vals=vals, bits=bits, kp_b=kp_b
    )
    return pl.pallas_call(
        kernel,
        grid=(E, M // bm, N // bn, Kpacked // bkp),
        in_specs=x_specs + w_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((E, M, N), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*([xg] * vals), packed3, scale3, shift3)


def qbits_moe_prefill_call(
    xg: jnp.ndarray,
    packed3: jnp.ndarray,
    scale3: jnp.ndarray,
    shift3: jnp.ndarray,
    bits: int,
    group_size: Optional[int],
    *,
    k_shards: int = 1,
    interpret: bool = False,
    eids: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """out[e] = xg[e] @ dequant(W[e]).T — batched-expert M/N/K-tiled prefill
    GEMM over per-expert gathered token slabs. xg [E, cap, K] with cap a
    multiple of the M tile; returns [E, cap, N] f32 or None.

    With `eids` [U] int32 (U == xg.shape[0] slots): slot u multiplies
    against W[eids[u]] — the unique-expert dedup route's down projection."""
    if xg.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if not _stacked_ok(xg[0], packed3, bits, group_size, k_shards):
        return None
    E, M, K = xg.shape
    _, N, Kpacked = packed3.shape
    vals = _word_vals(packed3.dtype, bits)
    gs = group_size if group_size is not None else K
    if gs == K:
        return None  # per-tensor: G rows too few for a VMEM block (qbits_mm rule)
    kp_b = Kpacked // k_shards
    G = scale3.shape[1]
    # M tile: prefill slabs are cap-sized (e.g. 1024-2048 rows); small-cap
    # decode batches should use the sel/all kernels instead.
    bm = None
    for bm_c in (256, 128, 64, 32, 16, 8):
        if M % bm_c == 0:
            bm = bm_c
            break
    if bm is None:
        return None

    def vmem_est(bn_c, bkp_c):
        x_b = vals * bm * bkp_c * xg.dtype.itemsize
        w_b = bn_c * bkp_c * packed3.dtype.itemsize
        s_b = 2 * G * bn_c * 4
        return 2 * (x_b + w_b + s_b) + bm * bn_c * 4

    bkp = bn = None
    for bkp_c in (1024, 512, 256, 128):
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
    return _moe_prefill_call(
        xg, packed3,
        scale3.astype(jnp.float32), shift3.astype(jnp.float32),
        group_size=gs, bm=bm, bn=bn, bkp=bkp, vals=vals, bits=bits,
        k_shards=k_shards, interpret=interpret,
        eids=None if eids is None else eids.astype(jnp.int32),
    )
