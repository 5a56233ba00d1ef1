"""Ablation 4: why does the qbits weight kernel stream at 322 GB/s while the
attention kernels sit at ~48 GB/s? Pure streaming (ones-dot reduce) variants:

  qclone_u8   - exact qbits shape: [14336, 2048] uint8, grid 14, block (1024, 2048)
  qshape_bf16 - same block bytes, bf16: [14336, 1024] bf16, block (1024, 1024)
  kv_u8       - kv-like: [8*2048, 512] uint8, grid 8, block (2048, 512)
  kv_bf16     - kv-like: [8*2048, 512] bf16, grid 8, block (2048, 512)
  kv_bf16_ce  - kv_bf16 + cost_estimate (the qbits kernel sets one)
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


def make_fn(rows, cols, dtype, grid, block_rows, with_ce):
    def kern(x_ref, w_ref, o_ref):
        acc = jnp.zeros((8, cols), jnp.float32)
        step = 512
        for c in range(0, block_rows, step):
            wc = w_ref[c : c + step, :]
            if wc.dtype == jnp.uint8:
                wc = wc.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            ones = jnp.ones((8, step), jnp.bfloat16)
            acc += lax.dot_general(ones, wc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[:] = acc + x_ref[0, 0]

    kwargs = {}
    if with_ce:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * 8 * rows * cols,
            bytes_accessed=rows * cols * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        )

    @jax.jit
    def fn(x, w):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda b: (0, 0)),
                pl.BlockSpec((block_rows, cols), lambda b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((8, cols), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((grid * 8, cols), jnp.float32),
            **kwargs,
        )(x, w)

    return fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    key = jax.random.PRNGKey(0)

    cases = [
        ("qclone_u8", 14336, 2048, jnp.uint8, 14, 1024, False),
        ("qshape_bf16", 14336, 1024, jnp.bfloat16, 14, 1024, False),
        ("kv_u8", 8 * 2048, 512, jnp.uint8, 8, 2048, False),
        ("kv_bf16", 8 * 2048, 512, jnp.bfloat16, 8, 2048, False),
        ("kv_bf16_ce", 8 * 2048, 512, jnp.bfloat16, 8, 2048, True),
    ]
    for name, rows, cols, dtype, grid, block_rows, ce in cases:
        if dtype == jnp.uint8:
            w = jax.random.randint(key, (rows, cols), 0, 255, jnp.int32).astype(jnp.uint8)
        else:
            w = jax.random.normal(key, (rows, cols), dtype)
        xs = jnp.arange(args.iters, dtype=jnp.float32).reshape(-1, 1, 1)
        fn = make_fn(rows, cols, dtype, grid, block_rows, ce)

        @jax.jit
        def run(xs, w, fn=fn):
            def body(c, xi):
                out = fn(xi, w)
                return c + jnp.sum(out), None

            c, _ = lax.scan(body, jnp.float32(0.0), xs)
            return c

        nbytes = rows * cols * jnp.dtype(dtype).itemsize
        ideal_us = nbytes / 819e9 * 1e6
        t0 = time.time()
        float(jax.device_get(run(xs, w)))
        log(f"{name}: compile+warm {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jax.device_get(run(xs, w)))
            best = min(best, time.time() - t0)
        us = best / args.iters * 1e6
        log(f"{name}: {us:.1f} us -> {nbytes/1e6/us*1e6/1e3:.0f} GB/s ({ideal_us:.1f} us ideal)")


if __name__ == "__main__":
    main()
