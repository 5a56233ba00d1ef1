"""DMA-floor ablations for the flash-decode kernel block layouts.

All variants stream the same 33.6 MB of bf16 k+v per step and do a trivial
reduce; differences are purely block shape / grid structure:
  base4d  - [B, S, 1, KD] blocks (1, S, 1, KD)       (current kernel layout)
  flat3d  - [B, S, KD] blocks (1, S, KD)             (no singleton dim)
  rows2d  - [B*S, KD] blocks (S, KD)                 (2D, fully contiguous)
  chunk3d - [B, S, KD] blocks (1, sb, KD), grid (B, S/sb)  (small-block pipeline)
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    import sys

    print(msg, file=sys.stderr, flush=True)


def make_fn(mode, B, S, KD, sb):
    vmem = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    if mode == "base4d":
        def kern(k_ref, v_ref, o_ref):
            acc = jnp.zeros((8, KD), jnp.float32)
            for c in range(S // sb):
                acc += jnp.sum(k_ref[0, c * sb : (c + 1) * sb, 0, :].astype(jnp.float32), axis=0, keepdims=True)
                acc += jnp.sum(v_ref[0, c * sb : (c + 1) * sb, 0, :].astype(jnp.float32), axis=0, keepdims=True)
            o_ref[0] = acc

        @jax.jit
        def fn(k, v):
            k = k.reshape(B, S, 1, KD)
            v = v.reshape(B, S, 1, KD)
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, S, 1, KD), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, S, 1, KD), lambda b: (b, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 8, KD), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 8, KD), jnp.float32),
                compiler_params=vmem,
            )(k, v)
        return fn

    if mode == "flat3d":
        def kern(k_ref, v_ref, o_ref):
            acc = jnp.zeros((8, KD), jnp.float32)
            for c in range(S // sb):
                acc += jnp.sum(k_ref[0, c * sb : (c + 1) * sb, :].astype(jnp.float32), axis=0, keepdims=True)
                acc += jnp.sum(v_ref[0, c * sb : (c + 1) * sb, :].astype(jnp.float32), axis=0, keepdims=True)
            o_ref[0] = acc

        @jax.jit
        def fn(k, v):
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 8, KD), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 8, KD), jnp.float32),
                compiler_params=vmem,
            )(k, v)
        return fn

    if mode == "rows2d":
        def kern(k_ref, v_ref, o_ref):
            acc = jnp.zeros((8, KD), jnp.float32)
            for c in range(S // sb):
                acc += jnp.sum(k_ref[c * sb : (c + 1) * sb, :].astype(jnp.float32), axis=0, keepdims=True)
                acc += jnp.sum(v_ref[c * sb : (c + 1) * sb, :].astype(jnp.float32), axis=0, keepdims=True)
            o_ref[:] = acc

        @jax.jit
        def fn(k, v):
            k = k.reshape(B * S, KD)
            v = v.reshape(B * S, KD)
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((S, KD), lambda b: (b, 0)),
                    pl.BlockSpec((S, KD), lambda b: (b, 0)),
                ],
                out_specs=pl.BlockSpec((8, KD), lambda b: (b, 0)),
                out_shape=jax.ShapeDtypeStruct((B * 8, KD), jnp.float32),
                compiler_params=vmem,
            )(k, v)
        return fn

    if mode == "chunk3d":
        def kern(k_ref, v_ref, o_ref):
            acc = jnp.sum(k_ref[0].astype(jnp.float32), axis=0, keepdims=True)
            acc += jnp.sum(v_ref[0].astype(jnp.float32), axis=0, keepdims=True)
            o_ref[0, 0] = jnp.broadcast_to(acc, (8, KD))

        @jax.jit
        def fn(k, v):
            return pl.pallas_call(
                kern,
                grid=(B, S // sb),
                in_specs=[
                    pl.BlockSpec((1, sb, KD), lambda b, c: (b, c, 0)),
                    pl.BlockSpec((1, sb, KD), lambda b, c: (b, c, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, 8, KD), lambda b, c: (b, c, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, S // sb, 8, KD), jnp.float32),
                compiler_params=vmem,
            )(k, v)
        return fn

    raise ValueError(mode)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--sb", type=int, default=512)
    p.add_argument("--modes", type=str, default="base4d,flat3d,rows2d,chunk3d")
    args = p.parse_args()
    B, S, KD = 8, 2048, 512

    key = jax.random.PRNGKey(0)
    ks = jnp.stack([jax.random.normal(key, (B, S, KD), jnp.bfloat16) for _ in range(2)])
    v = jax.random.normal(key, (B, S, KD), jnp.bfloat16)
    ideal_us = 2 * B * S * KD * 2 / 819e9 * 1e6

    for mode in args.modes.split(","):
        fn = make_fn(mode, B, S, KD, args.sb)

        @jax.jit
        def run(ks, v):
            def body(c, ki):
                out = fn(ki, v)
                return c + jnp.sum(out), None

            c, _ = lax.scan(body, jnp.float32(0.0), ks)
            return c

        # vary k per iter via 2 stacked copies cycled by scan over 50 proxies
        kss = jnp.concatenate([ks] * (args.iters // 2))
        t0 = time.time()
        float(jax.device_get(run(kss, v)))
        log(f"{mode}: compile+warm {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jax.device_get(run(kss, v)))
            best = min(best, time.time() - t0)
        us = best / args.iters * 1e6
        log(f"{mode}: {us:.1f} us ({ideal_us/us*100:.0f}% of HBM BW, ideal {ideal_us:.1f})")


if __name__ == "__main__":
    main()
