"""DMA-element-width ablation for the int4 decode kernel.

Hypothesis: the production kernel's healthy-session 322 GB/s packed stream
(vs 727 GB/s for the bf16 matmul's weight stream in the same session) is a
*uint8 DMA width* effect — the [bn, Kpacked] uint8 weight blocks stream at
~40% of HBM while 2-byte bf16 blocks hit ~90%. If true, storing the packed
nibbles as int32 words (8 codes/word, "w32" layout: word j of row n holds
code[n, j + p*(K/8)] in bits 4p..4p+3) moves the same bytes as 4-byte
elements and should lift the floor; the VPU unpack cost is essentially
unchanged (shift+mask+cast per value either way — the uint8 path pays an
extra widen-to-int32, the w32 path pays a mask on every part because the
top nibble sits under the int32 sign bit).

Same-run comparisons only (tunnel sessions carry additive offsets —
RESULTS.md): every variant runs in ONE process, ratios against the same-run
bf16 matmul are the decision signal.
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

_CHUNK = 128


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


# ------------------------------------------------------------------ w32


def pack_w32(codes: np.ndarray) -> np.ndarray:
    """codes [N, K] uint8 (0..15) -> int32 [N, K/8]; word j holds
    code[:, j + p*(K/8)] in bits 4p..4p+3."""
    N, K = codes.shape
    W = K // 8
    acc = np.zeros((N, W), np.uint32)
    for p in range(8):
        acc |= codes[:, p * W : (p + 1) * W].astype(np.uint32) << (4 * p)
    return acc.view(np.int32)


def _w32_kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, group_size):
    M = x_ref.shape[0]
    BN = p_ref.shape[0]
    W = p_ref.shape[1]  # int32 words per row
    K = W * 8
    nchunks = W // _CHUNK
    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(dot_dtype)
    y = jnp.zeros((M, BN), jnp.float32)
    for c in range(nchunks):
        b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK]  # int32, no widen
        for part in range(8):
            # part 7 sits under the sign bit -> mask ALL parts except 0.
            raw = b32 & 15 if part == 0 else (b32 >> (4 * part)) & 15
            codes = raw.astype(dot_dtype)
            k0 = part * (K // 8) + c * _CHUNK
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


@functools.partial(jax.jit, static_argnames=("group_size", "bn", "interpret"))
def w32_call(x, packed32, scale_t, shift_t, *, group_size, bn, interpret=False):
    M, K = x.shape
    N, W = packed32.shape
    G = scale_t.shape[0]
    kernel = functools.partial(_w32_kernel, group_size=group_size)
    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * W * 4 + M * K * x.dtype.itemsize + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed32, scale_t, shift_t)


# ------------------------------------------------------------------ main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--gs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    M, K, N, gs = args.m, args.k, args.n, args.gs
    interpret = jax.default_backend() != "tpu"

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (N, K), dtype=np.uint8)
    G = K // gs
    scale = rng.uniform(0.5, 1.5, (N, G)).astype(np.float32) / 8
    shift = rng.uniform(-1, 1, (N, G)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

    # dequant reference
    deq = (
        codes.reshape(N, G, gs).astype(np.float32) * scale[:, :, None]
        - shift[:, :, None]
    ).reshape(N, K)
    w_bf16 = jnp.asarray(deq, jnp.bfloat16)
    ref = np.asarray(jnp.dot(x, w_bf16.T, preferred_element_type=jnp.float32))

    packed_u8 = jnp.asarray(pack_split_half(jnp.asarray(codes), 4))
    packed_32 = jnp.asarray(pack_w32(codes))
    scale_t = jnp.asarray(scale.T)
    shift_t = jnp.asarray(shift.T)

    def check(name, out):
        out = np.asarray(out, np.float32)
        cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
        print(f"  {name}: cos={cos:.6f}")
        assert cos > 0.999, (name, cos)

    pbytes = N * K // 2
    results = {}

    # same-run bf16 reference (session health + ratio denominator)
    t = timed_scan(lambda xi, w: jnp.dot(xi, w.T, preferred_element_type=jnp.float32),
                   x, (w_bf16,), iters=args.iters)
    results["bf16_matmul"] = t
    print(f"bf16 matmul: {t*1e6:.1f} us  ({N*K*2/t/1e9:.0f} GB/s weight stream)")

    # production uint8 split-half kernel
    out = qbits_matmul_kernel_call(x, packed_u8, scale_t, shift_t, 4, gs, interpret=interpret)
    check("prod_u8", out)
    t = timed_scan(
        lambda xi, p, s, z: qbits_matmul_kernel_call(xi, p, s, z, 4, gs, interpret=interpret),
        x, (packed_u8, scale_t, shift_t), iters=args.iters)
    results["prod_u8"] = t
    print(f"prod u8 kernel: {t*1e6:.1f} us  ({pbytes/t/1e9:.0f} GB/s packed)")

    # w32 kernel
    bn = 1024 if N % 1024 == 0 else 512
    out = w32_call(x, packed_32, scale_t, shift_t, group_size=gs, bn=bn, interpret=interpret)
    check("w32", out)
    t = timed_scan(
        lambda xi, p, s, z: w32_call(xi, p, s, z, group_size=gs, bn=bn, interpret=interpret),
        x, (packed_32, scale_t, shift_t), iters=args.iters)
    results["w32"] = t
    print(f"w32 kernel (bn={bn}): {t*1e6:.1f} us  ({pbytes/t/1e9:.0f} GB/s packed)")

    # w32 with bn=512 (smaller blocks, more pipelining)
    out = w32_call(x, packed_32, scale_t, shift_t, group_size=gs, bn=512, interpret=interpret)
    check("w32_bn512", out)
    t = timed_scan(
        lambda xi, p, s, z: w32_call(xi, p, s, z, group_size=gs, bn=512, interpret=interpret),
        x, (packed_32, scale_t, shift_t), iters=args.iters)
    results["w32_bn512"] = t
    print(f"w32 kernel (bn=512): {t*1e6:.1f} us  ({pbytes/t/1e9:.0f} GB/s packed)")

    base = results["bf16_matmul"]
    print("\nsame-run ratios (vs bf16 matmul, higher=better):")
    for k, v in results.items():
        print(f"  {k}: {base/v:.3f}x   {v*1e6:.1f} us")


if __name__ == "__main__":
    main()
