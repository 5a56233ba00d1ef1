"""Manual double-buffered DMA for the int4 decode kernel (TODO #1, last lever).

The production decode kernel (`ops/pallas/qbits_mm.py:_kernel`) relies on the
automatic Mosaic block pipeline: grid over N, packed weight blocks
[bn, Kpacked] prefetched into VMEM one grid step ahead. It sits at ~85% of
the bf16 streaming roof at 8B shapes (RESULTS.md round-2 ablation: unpack is
free, scale payloads within noise, K-tiling and DMA element width neutral).

This experiment replaces the automatic pipeline with explicit
`pltpu.make_async_copy` streaming: one program (grid=()), packed weights left
in HBM (`pl.ANY`), an nbuf-slot VMEM scratch ring, DMAs issued `nbuf-1`
chunks ahead of compute. Levers the auto pipeline can't express:

  - deeper buffering (nbuf=3,4) to ride out HBM latency jitter;
  - DMA chunk size decoupled from the compute block (finer chunks start
    compute earlier / smooth the tail);
  - no per-grid-step revisit of x (loaded once) or out (written per chunk).

Same-run comparisons only (tunnel sessions carry additive offsets): every
variant + the production kernel + the bf16 matmul roof run in ONE process.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanto_tpu.ops.pallas.qbits_mm import (
    _unpack_part,
    _word_vals,
    pack_for_kernel,
    qbits_matmul_kernel_call,
)

_CHUNK = 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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


def _manual_kernel(x_ref, p_hbm, s_ref, z_ref, out_ref, *, bits, group_size, bn, nbuf):
    """grid=() manual-stream variant of the decode kernel.

    p_hbm:   [N, Kpacked] packed words, memory_space=ANY (stays in HBM)
    s_ref/z_ref: [nc, G, bn] f32 (scales pre-chunked on host along N)
    out_ref: [nc, M, bn] f32
    """
    M = x_ref.shape[0]
    Kp = p_hbm.shape[1]
    nc = out_ref.shape[0]
    vals = _word_vals(p_hbm.dtype, bits)
    unsigned = p_hbm.dtype == jnp.uint8
    mask = 2**bits - 1
    nk = Kp // _CHUNK
    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(dot_dtype)

    def body(scratch, sems):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * bn, bn), :], scratch.at[slot], sems.at[slot]
            )

        for w in range(min(nbuf - 1, nc)):
            get_dma(w, w).start()

        def loop(i, _):
            slot = i % nbuf

            @pl.when(i + nbuf - 1 < nc)
            def _():
                get_dma((i + nbuf - 1) % nbuf, i + nbuf - 1).start()

            get_dma(slot, i).wait()
            y = jnp.zeros((M, bn), jnp.float32)
            for c in range(nk):
                b32 = scratch[slot, :, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
                for part in range(vals):
                    raw = _unpack_part(b32, part, bits, vals, mask, unsigned)
                    codes = raw.astype(dot_dtype)
                    k0 = (part * Kp // _CHUNK + c) * _CHUNK  # k_shards=1 layout
                    g = k0 // group_size
                    xg = x[:, k0 : k0 + _CHUNK]
                    pd = jax.lax.dot_general(
                        xg, codes,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                    y += pd * s_ref[i, g, :][None, :] - xsum * z_ref[i, g, :][None, :]
            out_ref[i] = y
            return 0

        lax.fori_loop(0, nc, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((nbuf, bn, Kp), p_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "bn", "nbuf", "interpret"))
def manual_call(x, packed, scale_t, shift_t, *, bits, group_size, bn, nbuf, interpret=False):
    M, K = x.shape
    N, Kp = packed.shape
    G = scale_t.shape[0]
    nc = N // bn
    # Pre-chunk scales along N so the kernel indexes a leading (sublane-free)
    # dynamic dim instead of dynamic lane slices.
    s3 = scale_t.astype(jnp.float32).reshape(G, nc, bn).transpose(1, 0, 2)
    z3 = shift_t.astype(jnp.float32).reshape(G, nc, bn).transpose(1, 0, 2)
    kernel = functools.partial(
        _manual_kernel, bits=bits, group_size=group_size, bn=bn, nbuf=nbuf
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, M, bn), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kp * packed.dtype.itemsize
            + M * K * x.dtype.itemsize + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed, s3, z3)
    return out.transpose(1, 0, 2).reshape(M, N)


def run_shape(K, N, M=8, gs=128, bits=4, iters=100, verify=False):
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 2**bits, (N, K)).astype(np.uint8)
    G = K // gs
    scale = (rng.rand(G, N).astype(np.float32) + 0.5) * 0.01
    shift = rng.randn(G, N).astype(np.float32) * 0.01
    packed = jnp.asarray(pack_for_kernel(codes, bits))
    s_t = jnp.asarray(scale)
    z_t = jnp.asarray(shift)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w_bf16 = jnp.asarray(rng.randn(N, K), jnp.bfloat16)

    log(f"--- shape K={K} N={N} M={M} packed={packed.dtype} Kp={packed.shape[1]}")

    if verify:
        ref = np.asarray(
            qbits_matmul_kernel_call(x, packed, s_t, z_t, bits, gs)
        ).astype(np.float32)
        got = np.asarray(
            manual_call(x, packed, s_t, z_t, bits=bits, group_size=gs, bn=512, nbuf=2)
        ).astype(np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        log(f"verify manual vs prod: rel err {err:.2e}")
        assert err < 2e-2, err

    t = timed_scan(lambda xi: jnp.dot(xi, w_bf16.T), x, (), iters)
    bf16_gbs = N * K * 2 / t / 1e9
    log(f"bf16 matmul roof: {t*1e6:7.1f} us  ({bf16_gbs:5.0f} GB/s weight stream)")

    t = timed_scan(
        lambda xi: qbits_matmul_kernel_call(xi, packed, s_t, z_t, bits, gs),
        x, (), iters,
    )
    pbytes = packed.shape[1] * packed.dtype.itemsize * N
    prod = t
    log(f"prod auto-pipeline:  {t*1e6:7.1f} us  ({pbytes/t/1e9:5.0f} GB/s packed)")

    for nbuf in (2, 4):
        for bn in (512, 1024, 2048):
            if N % bn:
                continue
            # VMEM: scratch nbuf*bn*Kp*item + x + out + scales
            vmem = (
                nbuf * bn * packed.shape[1] * packed.dtype.itemsize
                + M * K * 2 + M * N * 4 + 2 * (K // gs) * N * 4
            )
            if vmem > 14 * 1024 * 1024:
                log(f"manual nbuf={nbuf} bn={bn}: skipped (VMEM {vmem>>20} MB)")
                continue
            try:
                t = timed_scan(
                    lambda xi: manual_call(
                        xi, packed, s_t, z_t, bits=bits, group_size=gs, bn=bn, nbuf=nbuf
                    ),
                    x, (), iters,
                )
                log(
                    f"manual nbuf={nbuf} bn={bn}: {t*1e6:7.1f} us  "
                    f"({pbytes/t/1e9:5.0f} GB/s packed, {prod/t:.3f}x vs prod)"
                )
            except Exception as e:  # noqa: BLE001
                log(f"manual nbuf={nbuf} bn={bn}: FAILED {type(e).__name__}: {str(e)[:200]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--verify", action="store_true")
    p.add_argument("--interpret-test", action="store_true",
                   help="CPU interpret-mode correctness check only")
    args = p.parse_args()
    if args.interpret_test:
        rng = np.random.RandomState(0)
        K, N, M, gs, bits = 512, 512, 8, 128, 4
        codes = rng.randint(0, 16, (N, K)).astype(np.uint8)
        G = K // gs
        scale = (rng.rand(G, N).astype(np.float32) + 0.5) * 0.01
        shift = rng.randn(G, N).astype(np.float32) * 0.01
        packed = jnp.asarray(pack_for_kernel(codes, bits))
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        deq = scale.T[:, :, None] * codes.reshape(N, G, gs) - shift.T[:, :, None]
        ref = np.asarray(x, np.float32) @ deq.reshape(N, K).T.astype(np.float32)
        got = np.asarray(
            manual_call(x, packed, jnp.asarray(scale), jnp.asarray(shift),
                        bits=bits, group_size=gs, bn=128, nbuf=2, interpret=True)
        )
        err = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"interpret rel err {err:.2e}")
        assert err < 2e-2
        return
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    run_shape(4096, 14336, iters=args.iters, verify=args.verify)
    run_shape(14336, 4096, iters=args.iters)
    run_shape(4096, 4096, iters=args.iters)


if __name__ == "__main__":
    main()
