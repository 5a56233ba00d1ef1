"""Prefill-shaped int4 matmul: tiled Pallas kernel vs alternatives.

Same-session ratios at M in {512, 1024, 2048} (prompt-sized batches),
K=4096 N=14336 g128: the M/N/K-tiled `_prefill_call` vs the VMEM-resident
decode kernel (M<=512), the XLA unpack+dequant fallback, and the bf16
matmul (the compute-ideal reference a quantized prefill should approach).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

from quanto_tpu.ops.pallas.qbits_mm import (
    _call,
    _prefill_call,
    pack_split_half,
    unpack_split_half,
)


def timed(fn, x, iters=20):
    xs = jnp.stack([x * (1 + i * 1e-6) for i in range(iters)])

    @jax.jit
    def run(xs):
        def body(c, xi):
            return c + jnp.sum(fn(xi)), None
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
    p.add_argument("--bits", type=int, default=4, choices=(2, 4))
    args = p.parse_args()
    bits = args.bits
    vals = 8 // bits
    mid = float(2 ** (bits - 1))
    key = jax.random.PRNGKey(0)
    K, N, gs = 4096, 14336, 128
    G = K // gs
    codes = jax.random.randint(key, (N, K), 0, 2**bits, jnp.uint8)
    packed = pack_split_half(codes, bits=bits)
    scale_t = (jnp.abs(jax.random.normal(key, (G, N))) / 15.0).astype(jnp.float32)
    shift_t = (scale_t * mid).astype(jnp.float32)
    scale = scale_t.T.reshape(N, G, 1)
    w_bf16 = jax.random.normal(key, (N, K), jnp.bfloat16)

    def xla_fallback(x):
        c = unpack_split_half(packed, bits, K).astype(jnp.float32).reshape(N, G, gs)
        w = ((c - mid) * scale).reshape(N, K).astype(jnp.bfloat16)
        return jnp.dot(x, w.T, preferred_element_type=jnp.float32)

    def bf16(x):
        return jnp.dot(x, w_bf16.T, preferred_element_type=jnp.float32)

    def decode_kernel(x):
        return _call(x, packed, scale_t, shift_t, bits=bits, group_size=gs)

    for M in (512, 1024, 2048):
        bkp = 2048 if M <= 1024 else 1024  # matches qbits_matmul_kernel_call routing
        bkp = min(bkp, K * bits // 8)

        def prefill_kernel(x, bkp=bkp):
            return _prefill_call(
                x, packed, scale_t, shift_t,
                group_size=gs, bm=256, bn=1024, bkp=bkp, vals=vals,
            )

        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        rows = [("prefill-kernel", prefill_kernel), ("xla-fallback", xla_fallback), ("bf16", bf16)]
        if M <= 512:
            rows.insert(1, ("decode-kernel", decode_kernel))
        times = {name: timed(fn, x) for name, fn in rows}
        gflop = 2 * M * N * K / 1e9
        line = f"M={M:5d}: " + "  ".join(
            f"{name} {t*1e6:8.1f}us ({gflop/t/1e3:5.1f} TF/s)" for name, t in times.items()
        )
        print(line, flush=True)


if __name__ == "__main__":
    main()
