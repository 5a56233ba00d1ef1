"""Kernel microbenchmarks on the real TPU (analogue of the reference
`bench/kernels/benchmark_w4a16.py` / `benchmark_marlin_fp8.py`).

Times decode-shaped matmuls (small M) across weight formats. Each variant
runs inside one jitted lax.scan with a data dependency between steps, so the
axon tunnel RTT amortizes away and nothing constant-folds.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_scan(fn, x, args, iters=100, repeats=3):
    """Time `fn(x_i, *args)` over `iters` distinct inputs inside one jitted
    scan (per-step inputs differ so nothing hoists; steps are independent so
    there is no serialization bubble). Returns sec/iter."""
    xs = jnp.stack([x + i for i in range(iters)]) if jnp.issubdtype(x.dtype, jnp.integer) else jnp.stack(
        [x * (1.0 + i * 1e-6) for i in range(iters)]
    )

    @jax.jit
    def run(xs, args):
        def body(c, xi):
            out = fn(xi, *args)
            return c + jnp.sum(out.astype(jnp.float32)), None
        c, _ = lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(jax.device_get(run(xs, args)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(jax.device_get(run(xs, args)))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=1)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=14336)
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()
    M, K, N = args.m, args.k, args.n

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w_bf16 = jax.random.normal(key, (N, K), jnp.bfloat16)
    w_i8 = jax.random.randint(key, (N, K), -127, 127, jnp.int8)
    scale = (jnp.abs(jax.random.normal(key, (N, 1))) / 127.0).astype(jnp.bfloat16)
    x_i8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    x_scale = jnp.bfloat16(0.01)

    def bf16_mm(x, w):
        return jnp.dot(x, w.T, preferred_element_type=jnp.float32)

    def i8_weight_scale_mm(x, w, s):
        wd = (w.astype(jnp.float32) * s.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.dot(x, wd.T, preferred_element_type=jnp.float32)

    def i8_output_scale_mm(x, w, s):
        y = jnp.dot(x, w.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return y * s.T.astype(jnp.float32)

    def i8_i8_mm(x, w, s):
        y = lax.dot_general(
            x, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * (s.T.astype(jnp.float32) * 0.01)

    from quanto_tpu.ops.pallas.qbytes_mm import qbytes_matmul_kernel_call

    def pallas_i8_mm(x, w, s):
        return qbytes_matmul_kernel_call(x, w, s)

    # int4 g128 split-half packed weights (W4A16 + W4A8 kernels).
    from quanto_tpu.ops.pallas.qbits_mm import (
        pack_split_half,
        qbits_int8_matmul_kernel_call,
        qbits_matmul_kernel_call,
    )

    gs = 128
    G = K // gs
    codes = jax.random.randint(key, (N, K), 0, 16, jnp.uint8)
    packed = pack_split_half(codes, bits=4)
    scale_t = (jnp.abs(jax.random.normal(key, (G, N))) / 15.0).astype(jnp.float32)
    shift_t = (scale_t * 8.0).astype(jnp.float32)

    def pallas_i4_mm(x, p, s, z):
        return qbits_matmul_kernel_call(x, p, s, z, 4, gs)

    def pallas_w4a8_mm(x, p, s, z):
        return qbits_int8_matmul_kernel_call(x, jnp.float32(0.01), p, s, z, 4, gs, jnp.bfloat16)

    # fp8 weight-only: XLA convert-fusion vs pallas manual integer decode.
    from quanto_tpu.ops.pallas.qbytes_mm import qbytes_fp8_matmul_kernel_call

    w_f8 = (w_bf16.astype(jnp.float32) / 4.0).astype(jnp.float8_e4m3fn)

    def f8_output_scale_mm(x, w, s):
        y = jnp.dot(x, w.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return y * s.T.astype(jnp.float32)

    def pallas_f8_mm(x, w, s):
        return qbytes_fp8_matmul_kernel_call(x, w, s)

    variants = {
        "bf16xbf16": (bf16_mm, x, (w_bf16,)),
        "int8 w, weight-scale": (i8_weight_scale_mm, x, (w_i8, scale)),
        "int8 w, output-scale": (i8_output_scale_mm, x, (w_i8, scale)),
        "int8 x int8 (MXU int)": (i8_i8_mm, x_i8, (w_i8, scale)),
        "int8 w, pallas fused": (pallas_i8_mm, x, (w_i8, scale)),
        "int4 w, pallas W4A16": (pallas_i4_mm, x, (packed, scale_t, shift_t)),
        "int4 w, pallas W4A8": (pallas_w4a8_mm, x_i8, (packed, scale_t, shift_t)),
        "fp8 w, XLA convert": (f8_output_scale_mm, x, (w_f8, scale)),
        "fp8 w, pallas int-decode": (pallas_f8_mm, x, (w_f8, scale)),
    }

    print(f"M={M} K={K} N={N} ({2*M*K*N/1e9:.2f} GFLOP, w_bf16={2*K*N/1e9:.3f} GB, w_i8={K*N/1e9:.3f} GB)")
    for name, (fn, xv, a) in variants.items():
        sec = timed_scan(fn, xv, a, iters=args.iters)
        flops = 2 * M * K * N / sec / 1e12
        wbpe = 2 if "bf16x" in name else (0.5 if "int4" in name else 1)
        wbytes = K * N * wbpe / sec / 1e9
        print(f"{name:26s}: {sec*1e6:8.1f} us  {flops:6.2f} TFLOP/s  weight-read {wbytes:7.1f} GB/s")


if __name__ == "__main__":
    main()
