"""Decode-kernel (M=8, K=4096, N=14336 g128) VPU-cost A/B: same-session
variants of the production `_kernel` to find removable unpack work.

Variants (identical grid/blocks; all numerically compared to the oracle
before timing, except `nounpack` which is deliberately wrong):
  mask      - production algebra: widen, (shift), mask, cast, dot
  nomask    - skip the &0xF on the LAST nibble part (after >>4 on a
              u8-widened int32 nothing sits above bit 3 - mask is a no-op)
  nounpack  - dot the RAW bytes (skips nibble split entirely): lower bound
              for DMA + widen + cast + dots at half the dot count
Observed (v5e, 2026-08, DEGRADED session — production `_call` measured
1364 us in the same process vs 91 us healthy): mask 925 us here, and
`nounpack` (strictly less work) came out SLOWER than `mask`, so these
numbers are not trustworthy; re-run in a healthy session (calibrate against
`ops.pallas.qbits_mm._call` in the same process first). The `nomask`
transform was adopted in the production kernels on exactness grounds alone
(the correctness assert below proves it bit-identical).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_CHUNK = 128


def make_kernel(variant, bits=4, group_size=128):
    vals = 8 // bits
    mask = 2**bits - 1

    def kern(x_ref, p_ref, s_ref, z_ref, out_ref):
        M = x_ref.shape[0]
        BN = p_ref.shape[0]
        Kpacked = p_ref.shape[1]
        K = Kpacked * vals
        nchunks = Kpacked // _CHUNK
        x = x_ref[:].astype(jnp.bfloat16)

        if variant == "nounpack":
            y = jnp.zeros((M, BN), jnp.float32)
            for c in range(nchunks):
                codes = (
                    p_ref[:, c * _CHUNK : (c + 1) * _CHUNK]
                    .astype(jnp.int32)
                    .astype(jnp.bfloat16)
                )
                xg = x[:, c * _CHUNK : (c + 1) * _CHUNK]
                y += lax.dot_general(
                    xg, codes, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * s_ref[0:1, :]
            out_ref[:] = y
            return

        y = jnp.zeros((M, BN), jnp.float32)
        for c in range(nchunks):
            b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
            for part in range(vals):
                if part == 0:
                    raw = b32 & mask
                elif variant == "nomask" and part == vals - 1:
                    raw = b32 >> (bits * part)  # high bits already zero
                else:
                    raw = (b32 >> (bits * part)) & mask
                codes = raw.astype(jnp.bfloat16)
                k0 = part * (K // vals) + c * _CHUNK
                g = k0 // group_size
                xg = x[:, k0 : k0 + _CHUNK]
                pd = lax.dot_general(
                    xg, codes, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                y += pd * s_ref[g : g + 1, :] - xsum * z_ref[g : g + 1, :]
        out_ref[:] = y

    return kern


def make_call(variant, M, K, N, bn, bits=4, group_size=128):
    Kpacked = K * bits // 8
    G = K // group_size
    kern = make_kernel(variant, bits, group_size)

    @jax.jit
    def fn(x, packed, s, z):
        return pl.pallas_call(
            kern,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, Kpacked), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=N * Kpacked + M * K * 2 + M * N * 4,
                transcendentals=0,
            ),
        )(x, packed, s, z)

    return fn


def timed(fn, args_, iters=30):
    xs = jnp.stack([args_[0] * (1 + i * 1e-6) for i in range(iters)])

    @jax.jit
    def run(xs):
        def body(c, xi):
            return c + jnp.sum(fn(xi, *args_[1:])), None
        c, _ = lax.scan(body, jnp.float32(0), xs)
        return c

    float(jax.device_get(run(xs)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(jax.device_get(run(xs)))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bn", type=int, default=1024)
    p.add_argument("-M", type=int, default=8)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)
    M, K, N, gs = args.M, 4096, 14336, 128
    Kpacked, G = K // 2, K // gs
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    packed = jax.random.randint(key, (N, Kpacked), 0, 255, jnp.int32).astype(jnp.uint8)
    s = (jnp.abs(jax.random.normal(key, (G, N))) / 15.0).astype(jnp.float32)
    z = (s * 8.0).astype(jnp.float32)

    # correctness cross-check: nomask must equal mask exactly
    fm = make_call("mask", M, K, N, args.bn)
    fn_ = make_call("nomask", M, K, N, args.bn)
    a = jax.device_get(fm(x, packed, s, z))
    b = jax.device_get(fn_(x, packed, s, z))
    assert (a == b).all(), "nomask changed numerics!"
    log("nomask numerics identical")

    nbytes = N * Kpacked
    for variant in ("mask", "nomask", "nounpack"):
        fn = make_call(variant, M, K, N, args.bn)
        t = timed(fn, (x, packed, s, z))
        print(
            f"{variant:9s}: {t*1e6:7.1f} us  packed-stream {nbytes/t/1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
