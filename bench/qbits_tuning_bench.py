"""int4 fused-kernel tuning: dot dtype, K-tiled grids, chunk sizes.

Same-run comparisons only (the tunneled chip's absolute speed varies by
session — RESULTS.md); every variant runs in ONE process so remote-compile
latency amortizes and ratios are trustworthy. The production kernel is
`quanto_tpu/ops/pallas/qbits_mm.py`; winners get folded back there.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanto_tpu.ops.pallas.qbits_mm import pack_split_half, qbits_matmul_kernel_call

_INTERPRET = None  # resolved lazily: True off-TPU (CPU interpret mode)


def _interpret():
    global _INTERPRET
    if _INTERPRET is None:
        import jax
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def timed_scan(fn, x, args, iters=100, repeats=3):
    xs = jnp.stack([x * (1.0 + i * 1e-6) for i in range(iters)])

    @jax.jit
    def run(xs, args):
        def body(c, xi):
            out = fn(xi, *args)
            return c + jnp.sum(out.astype(jnp.float32)), None
        c, _ = lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(jax.device_get(run(xs, args)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(jax.device_get(run(xs, args)))
        best = min(best, time.time() - t0)
    return best / iters


# ---------------------------------------------------------------- variants


def _kernel_bf16(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, chunk):
    """bf16 dots: int4 codes are exact in bf16, so the MXU runs at its bf16
    rate (8x the f32 rate) with unchanged numerics (f32 accumulation)."""
    M = x_ref.shape[0]
    Kpacked = p_ref.shape[1]
    vals = 8 // bits
    mask = 2**bits - 1
    nchunks = Kpacked // chunk
    K = Kpacked * vals
    BN = p_ref.shape[0]

    y = jnp.zeros((M, BN), jnp.float32)
    for part in range(vals):
        for c in range(nchunks):
            b32 = p_ref[:, c * chunk : (c + 1) * chunk].astype(jnp.int32)
            raw = (b32 >> (bits * part)) & mask if part else b32 & mask
            codes = raw.astype(jnp.float32).astype(jnp.bfloat16)
            k0 = part * (K // vals) + c * chunk
            g = k0 // group_size
            xg = x_ref[:, k0 : k0 + chunk]
            pd = jax.lax.dot_general(
                xg, codes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            y += pd * s_ref[g : g + 1, :] - xsum * z_ref[g : g + 1, :]
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "bn", "chunk"))
def call_bf16(x, packed, scale_t, shift_t, *, bits, group_size, bn, chunk):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    kernel = functools.partial(_kernel_bf16, bits=bits, group_size=group_size, chunk=chunk)
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
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked + M * K * 2 + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed, scale_t, shift_t)


def _kernel_bf16_ktiled(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, chunk):
    """K-tiled grid (k is the minor/arbitrary axis): smaller packed blocks
    pipeline HBM->VMEM DMA against MXU work; accumulate into the out block."""
    M = x_ref.shape[1]  # x block is [vals, M, bk]
    Kp_blk = p_ref.shape[1]
    vals = 8 // bits
    mask = 2**bits - 1
    nchunks = Kp_blk // chunk
    BN = p_ref.shape[0]
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    y = jnp.zeros((M, BN), jnp.float32)
    for part in range(vals):
        for c in range(nchunks):
            b32 = p_ref[:, c * chunk : (c + 1) * chunk].astype(jnp.int32)
            raw = (b32 >> (bits * part)) & mask if part else b32 & mask
            codes = raw.astype(jnp.float32).astype(jnp.bfloat16)
            # x block covers this k-tile's values for BOTH nibble halves:
            # [vals, M, bk] layout along the value axis (see call site).
            xg = x_ref[part, :, c * chunk : (c + 1) * chunk]
            pd = jax.lax.dot_general(
                xg, codes,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            # scales are part-major [vals, G/vals, BN] FULL blocks (a
            # g_per_tile-tall block would violate the (8,128) tiling rule);
            # index the global per-part group row.
            g = k_idx * (Kp_blk // group_size) + c * chunk // group_size
            y += pd * s_ref[part, pl.ds(g, 1), :] - xsum * z_ref[part, pl.ds(g, 1), :]
    out_ref[:] += y


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "bn", "bk", "chunk"))
def call_bf16_ktiled(x, packed, scale_t, shift_t, *, bits, group_size, bn, bk, chunk):
    """bk = packed bytes per k-tile. x is pre-reshaped to [vals, M, K/vals]
    so each k-tile's two nibble halves index the same packed block."""
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    vals = 8 // bits
    xr = x.reshape(M, vals, K // vals).transpose(1, 0, 2)  # [vals, M, K/vals]
    # Part-major scale layout: [vals, G/vals, N]; row [part, j] is the group
    # covering values [part*K/vals + j*gs, ... + gs).
    s3 = scale_t.reshape(vals, G // vals, N)
    z3 = shift_t.reshape(vals, G // vals, N)
    kernel = functools.partial(_kernel_bf16_ktiled, bits=bits, group_size=group_size, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(N // bn, Kpacked // bk),
        in_specs=[
            pl.BlockSpec((vals, M, bk), lambda i, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((vals, G // vals, bn), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((vals, G // vals, bn), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked + M * K * 2 + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(xr, packed, s3, z3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=14336)
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()
    M, K, N = args.m, args.k, args.n
    gs = 128
    G = K // gs

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w_bf16 = jax.random.normal(key, (N, K), jnp.bfloat16)
    codes = jax.random.randint(key, (N, K), 0, 16, jnp.uint8)
    packed = pack_split_half(codes, bits=4)
    scale_t = (jnp.abs(jax.random.normal(key, (G, N))) / 15.0).astype(jnp.float32)
    shift_t = (scale_t * 8.0).astype(jnp.float32)

    # Correctness oracle (dequant matmul) once, small tolerance.
    deq = (codes.astype(jnp.float32).reshape(N, G, gs) * scale_t.T[:, :, None]
           - shift_t.T[:, :, None]).reshape(N, K)
    want = np.asarray(jnp.matmul(x.astype(jnp.float32), deq.T))

    def check(name, out):
        # Norm-relative: per-element relative error explodes at near-zero
        # outputs (f32 accumulation-order noise over K=4096 sums).
        got = np.asarray(out, np.float32)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-2, (name, rel)

    variants = {
        "bf16 matmul (ref)": lambda xv: jnp.dot(xv, w_bf16.T, preferred_element_type=jnp.float32),
        "prod f32-dot": lambda xv: qbits_matmul_kernel_call(xv, packed, scale_t, shift_t, 4, gs, interpret=_interpret()),
        "bf16-dot bn1024 c128": lambda xv: call_bf16(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=1024, chunk=128),
        "bf16-dot bn2048 c128": lambda xv: call_bf16(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=2048, chunk=128),
        "bf16-dot bn512 c128": lambda xv: call_bf16(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=512, chunk=128),
        "ktiled bn1024 bk512": lambda xv: call_bf16_ktiled(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=1024, bk=512, chunk=128),
        "ktiled bn2048 bk512": lambda xv: call_bf16_ktiled(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=2048, bk=512, chunk=128),
        "ktiled bn1024 bk1024": lambda xv: call_bf16_ktiled(xv, packed, scale_t, shift_t, bits=4, group_size=gs, bn=1024, bk=1024, chunk=128),
    }

    print(f"M={M} K={K} N={N} packed={K*N/2/1e6:.1f} MB")
    for name, fn in variants.items():
        if "bk1024" in name and K // 2 < 1024:
            continue  # degenerate: zero k-tiles at this shape
        try:
            out = fn(x)
            if "ref" not in name:
                check(name, out)
            sec = timed_scan(fn, x, (), iters=args.iters)
            gbs = (K * N // 2) / sec / 1e9
            print(f"{name:22s}: {sec*1e6:8.1f} us  packed-stream {gbs:7.1f} GB/s")
        except Exception as e:  # keep other variants running
            print(f"{name:22s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
