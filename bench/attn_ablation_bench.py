"""Flash-decode kernel ablations: where does the time go?

Variants (bf16 cache, B=8, S=2048, Hkv=8, D=64 -> one [S, 512] block/batch):
  dma       - load k/v chunks, reduce-sum them (no dots): DMA + cast floor
  dots      - both dots, no mask/softmax/scales
  nosoftmax - dots + mask, softmax replaced by a scalar multiply
  full      - the real kernel body
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


def log(msg):
    import sys

    print(msg, file=sys.stderr, flush=True)


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, *, sb, scale, mode):
    b = pl.program_id(0)
    pos = pos_ref[b]
    M, KD = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[1]
    nchunks = S // sb
    dot_dtype = q_ref.dtype
    qf = q_ref[0, 0]

    def load(ref, c):
        return ref[0, c * sb : (c + 1) * sb, 0, :].astype(dot_dtype)

    if mode == "dma":
        acc = jnp.zeros((1, KD), jnp.float32)
        for c in range(nchunks):
            acc = acc + jnp.sum(load(k_ref, c).astype(jnp.float32), axis=0, keepdims=True)
            acc = acc + jnp.sum(load(v_ref, c).astype(jnp.float32), axis=0, keepdims=True)
        out_ref[0, 0] = jnp.broadcast_to(acc, (M, KD))
        return

    chunks = []
    for c in range(nchunks):
        lc = lax.dot_general(
            qf, load(k_ref, c), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if mode in ("nosoftmax", "full"):
            col = lax.broadcasted_iota(jnp.int32, (M, sb), 1) + c * sb
            lc = jnp.where(col <= pos, lc, -1e30)
        chunks.append(lc)
    logits = jnp.concatenate(chunks, axis=1)

    if mode == "full":
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
    else:
        p = logits * 1e-4

    acc = jnp.zeros((M, KD), jnp.float32)
    for c in range(nchunks):
        acc = acc + lax.dot_general(
            p[:, c * sb : (c + 1) * sb].astype(dot_dtype), load(v_ref, c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("sb", "scale", "mode"))
def _call(qbd, k, v, pos, *, sb, scale, mode):
    B, NG, M, KD = qbd.shape
    S = k.shape[1]
    kernel = functools.partial(_kernel, sb=sb, scale=scale, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NG),
        in_specs=[
            pl.BlockSpec((1, 1, M, KD), lambda b, j, *_: (b, j, 0, 0)),
            pl.BlockSpec((1, S, 1, KD), lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, S, 1, KD), lambda b, j, *_: (b, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, M, KD), lambda b, j, *_: (b, j, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NG, M, KD), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(pos, qbd, k, v)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--sb", type=int, default=512)
    p.add_argument("--modes", type=str, default="dma,dots,nosoftmax,full")
    args = p.parse_args()
    B, S, Hkv, G, D = 8, 2048, 8, 4, 64
    KD, M = 512, 32

    key = jax.random.PRNGKey(0)
    qbd = jax.random.normal(key, (B, 1, M, KD), jnp.bfloat16)
    qs = jnp.stack([qbd * (1.0 + i * 1e-3) for i in range(args.iters)])
    k = jax.random.normal(key, (B, S, 1, KD), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, 1, KD), jnp.bfloat16)
    pos = jnp.full((B,), S - 1, jnp.int32)
    ideal_us = 2 * B * S * KD * 2 / 819e9 * 1e6

    for mode in args.modes.split(","):
        @jax.jit
        def run(qs, mode=mode):
            def body(c, qi):
                out = _call(qi, k, v, pos, sb=args.sb, scale=D**-0.5, mode=mode)
                return c + jnp.sum(out), None

            c, _ = lax.scan(body, jnp.float32(0.0), qs)
            return c

        t0 = time.time()
        float(jax.device_get(run(qs)))
        log(f"{mode}: compile+warm {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jax.device_get(run(qs)))
            best = min(best, time.time() - t0)
        us = best / args.iters * 1e6
        log(f"{mode}: {us:.1f} us ({ideal_us/us*100:.0f}% of HBM BW, ideal {ideal_us:.1f})")


if __name__ == "__main__":
    main()
