"""Round-2 int4 decode-kernel ablation (VERDICT #6: push toward the HBM roof).

Hypothesis from cycle accounting: at decode shapes the kernel is
VPU/MXU-bound (unpack ~3.25 VPU ops/value + 8-row dots), not DMA-bound —
so layout levers move little and compute levers matter. Variants, all
measured same-session against the production kernel and the ideal-BW line:

- `prod`: production `_kernel` (w16, group-factored).
- `nounpack`: uses part-0 codes for every part (WRONG numerics; a ceiling
  that removes 3/4 of the shift+mask work but keeps DMA + dots).
- `nodot`: unpack but accumulate with adds only (no MXU) — isolates dots.
- `bf16scales`: scale/shift rows stored bf16 (halves the [G, N] f32 side
  traffic, ~6% of bytes at K=4096).

Decode shapes: the two 8B matmuls (K=4096 N=14336, K=14336 N=4096) and the
8B lm_head (K=4096, N=128256), M=8.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(msg, file=sys.stderr, flush=True)


from quanto_tpu.ops.pallas.qbits_mm import (  # noqa: E402
    _CHUNK,
    _pick_bn,
    _unpack_part,
    _word_vals,
    pack_for_kernel,
    qbits_matmul_kernel_call,
)


def _variant_kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, bits, group_size, mode):
    M = x_ref.shape[0]
    BN = p_ref.shape[0]
    Kpacked = p_ref.shape[1]
    unsigned = p_ref.dtype == jnp.uint8
    vals = _word_vals(p_ref.dtype, bits)
    mask = 2**bits - 1
    nchunks = Kpacked // _CHUNK

    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(dot_dtype)
    y = jnp.zeros((M, BN), jnp.float32)
    for c in range(nchunks):
        b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
        part0 = None
        for part in range(vals):
            if mode == "noupack" or mode == "nounpack":
                if part0 is None:
                    part0 = _unpack_part(b32, 0, bits, vals, mask, unsigned).astype(dot_dtype)
                codes = part0
            else:
                codes = _unpack_part(b32, part, bits, vals, mask, unsigned).astype(dot_dtype)
            k0 = part * (Kpacked * vals // vals) + c * _CHUNK
            g = k0 // group_size
            xg = x[:, k0 : k0 + _CHUNK]
            if mode == "nodot":
                pd = jnp.broadcast_to(
                    jnp.sum(codes.astype(jnp.float32), axis=1)[None, :], (M, BN)
                )
            else:
                pd = jax.lax.dot_general(
                    xg, codes, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            s = s_ref[g : g + 1, :].astype(jnp.float32)
            z = z_ref[g : g + 1, :].astype(jnp.float32)
            y += pd * s - xsum * z
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "mode"))
def _variant_call(x, packed, scale_t, shift_t, *, bits, group_size, mode):
    M, K = x.shape
    N, Kpacked = packed.shape
    G = scale_t.shape[0]
    bn = _pick_bn(N, Kpacked * packed.dtype.itemsize, M, K, x.dtype.itemsize)
    kernel = functools.partial(_variant_kernel, bits=bits, group_size=group_size, mode=mode)
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
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * Kpacked * packed.dtype.itemsize + M * K * 2,
            transcendentals=0,
        ),
    )(x, packed, scale_t, shift_t)


REPS = 500  # kernel invocations per device call: amortizes the tunnel's
# per-dispatch overhead (measured up to ~30 ms in degraded sessions: at
# REPS=50 a 91 us kernel is ~100% overhead), so per-variant ratios stay
# valid even when single-call microbenches do not.


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.RandomState(0)
    M, gs, bits = 8, 128, 4

    def timeit(fn, x, *args):
        # Chain REPS kernel calls in ONE program; a 0-valued data dependency
        # between steps defeats CSE without changing the numerics.
        def body(c, _):
            out = fn(c, *args)
            return c + 0.0 * jnp.sum(out).astype(c.dtype), None

        scanned = jax.jit(lambda x, *a: jnp.sum(jax.lax.scan(
            lambda c, _: body(c, _), x, None, length=REPS)[0]))
        float(jax.device_get(scanned(x, *args)))
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            float(jax.device_get(scanned(x, *args)))
            best = min(best, time.time() - t0)
        return best / REPS

    # Same-session bf16 matmul reference for calibration.
    a = jnp.asarray(rng.randn(2048, 4096), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    tmm = timeit(lambda a, b: a @ b, a, b)
    log(f"calib bf16 matmul 2048x4096x4096: {tmm*1e6:.0f} us "
        f"({2*2048*4096*4096/tmm/1e12:.1f} TF/s)")

    for K, N in [(4096, 14336), (14336, 4096), (4096, 128256)]:
        codes = rng.randint(0, 16, (N, K)).astype(np.uint8)
        packed = pack_for_kernel(jnp.asarray(codes), bits)
        G = K // gs
        scale = jnp.asarray(rng.rand(G, N).astype(np.float32) * 0.01)
        shift = jnp.asarray(rng.rand(G, N).astype(np.float32) * 0.05)
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        payload = N * K // 2 + 2 * G * N * 4 + M * K * 2

        t = timeit(
            lambda x, p, s, z: qbits_matmul_kernel_call(x, p, s, z, bits, gs).astype(jnp.float32),
            x, packed, scale, shift,
        )
        log(f"K={K} N={N} prod: {t*1e6:.0f} us ({payload/t/1e9:.0f} GB/s eff)")
        # "nodot" dropped: its broadcast-sum body fails Mosaic compile
        # (remote_compile 500) — the dot-cost question is answered by
        # comparing prod against the bf16 calib rate instead.
        for mode in ("nounpack",):
            tv = timeit(
                lambda x, p, s, z, m=mode: _variant_call(
                    x, p, s, z, bits=bits, group_size=gs, mode=m
                ),
                x, packed, scale, shift,
            )
            log(f"K={K} N={N} {mode}: {tv*1e6:.0f} us ({t/tv:.2f}x of prod)")
        # bf16 scales: same kernel, bf16 side payloads
        tb = timeit(
            lambda x, p, s, z: _variant_call(
                x, p, s, z, bits=bits, group_size=gs, mode="full"
            ),
            x, packed, scale.astype(jnp.bfloat16), shift.astype(jnp.bfloat16),
        )
        tf = timeit(
            lambda x, p, s, z: _variant_call(
                x, p, s, z, bits=bits, group_size=gs, mode="full"
            ),
            x, packed, scale, shift,
        )
        log(f"K={K} N={N} variant-f32scales: {tf*1e6:.0f} us; bf16scales: {tb*1e6:.0f} us "
            f"({tf/tb:.2f}x)")


if __name__ == "__main__":
    main()
