"""Ablation 3: contraction orientation.

Hypothesis: dot1 contracts dim 1 of the [sb, KD] key chunk — not the MXU's
native orientation, so Mosaic relayouts (transposes) every chunk. Variants:

  dmaones - stream k+v, reduce via ones-dot on the MXU (clean DMA floor;
            ablation2's sublane jnp.sum polluted the floor)
  dotT    - K stored transposed [B, KD, S]: dot1 contracts natively, one dot
            for the whole S; V native for dot2. Full attention math.
  full    - current kernel math (K [S, KD], chunked, transposing dot1)
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


VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def make_fn(mode, B, S, KD, M, sb, scale):
    if mode == "dmaones":
        def kern(q_ref, k_ref, v_ref, o_ref):
            ones = jnp.ones((8, sb), jnp.bfloat16)
            acc = jnp.zeros((8, KD), jnp.float32)
            for c in range(S // sb):
                kc = k_ref[0, c * sb : (c + 1) * sb, :]
                vc = v_ref[0, c * sb : (c + 1) * sb, :]
                acc += lax.dot_general(ones, kc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                acc += lax.dot_general(ones, vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[0] = acc

        @jax.jit
        def fn(q, k, v):
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, M, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 8, KD), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 8, KD), jnp.float32),
                compiler_params=VMEM,
            )(q, k, v)
        return fn

    if mode == "dotT":
        def kern(q_ref, kT_ref, v_ref, o_ref):
            qf = q_ref[0]  # [M, KD]
            kT = kT_ref[0]  # [KD, S]
            logits = lax.dot_general(
                qf, kT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [M, S]
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
            acc = jnp.zeros((M, KD), jnp.float32)
            for c in range(S // sb):
                acc += lax.dot_general(
                    p[:, c * sb : (c + 1) * sb], v_ref[0, c * sb : (c + 1) * sb, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc

        @jax.jit
        def fn(q, k, v):
            kT = jnp.swapaxes(k, 1, 2)  # one-time device transpose outside timing loop? no: traced per call
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, M, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, KD, S), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, M, KD), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, M, KD), jnp.float32),
                compiler_params=VMEM,
            )(q, kT, v)
        return fn

    if mode == "full":
        def kern(q_ref, k_ref, v_ref, o_ref):
            qf = q_ref[0]
            chunks = []
            for c in range(S // sb):
                kc = k_ref[0, c * sb : (c + 1) * sb, :]
                chunks.append(lax.dot_general(
                    qf, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale)
            logits = jnp.concatenate(chunks, axis=1)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
            acc = jnp.zeros((M, KD), jnp.float32)
            for c in range(S // sb):
                acc += lax.dot_general(
                    p[:, c * sb : (c + 1) * sb], v_ref[0, c * sb : (c + 1) * sb, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc

        @jax.jit
        def fn(q, k, v):
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, M, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                    pl.BlockSpec((1, S, KD), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, M, KD), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, M, KD), jnp.float32),
                compiler_params=VMEM,
            )(q, k, v)
        return fn

    raise ValueError(mode)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--sb", type=int, default=512)
    p.add_argument("--modes", type=str, default="dmaones,dotT,full")
    args = p.parse_args()
    B, S, KD, M = 8, 2048, 512, 32

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, M, KD), jnp.bfloat16)
    qs = jnp.stack([q * (1.0 + i * 1e-3) for i in range(args.iters)])
    k = jax.random.normal(key, (B, S, KD), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, KD), jnp.bfloat16)
    ideal_us = 2 * B * S * KD * 2 / 819e9 * 1e6

    for mode in args.modes.split(","):
        fn = make_fn(mode, B, S, KD, M, args.sb, 64 ** -0.5)

        @jax.jit
        def run(qs, k, v, fn=fn):
            def body(c, qi):
                out = fn(qi, k, v)
                return c + jnp.sum(out), None

            c, _ = lax.scan(body, jnp.float32(0.0), qs)
            return c

        t0 = time.time()
        float(jax.device_get(run(qs, k, v)))
        log(f"{mode}: compile+warm {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jax.device_get(run(qs, k, v)))
            best = min(best, time.time() - t0)
        us = best / args.iters * 1e6
        log(f"{mode}: {us:.1f} us ({ideal_us/us*100:.0f}% of HBM BW, ideal {ideal_us:.1f})")


if __name__ == "__main__":
    main()
