"""Decode-attention microbench: XLA einsum path vs the flash-decode kernel.

Runs the single-layer attention op in an RTT-amortizing scan (per-step q
varies; cache fixed). Shapes default to the 1B-llama bench model at batch 8,
ctx 2048. Ideal time = (k+v payload + scales) / HBM bandwidth.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(msg):
    import sys

    print(msg, file=sys.stderr, flush=True)


def einsum_attn(q, k, v, ks, vs, pos, scale):
    # The model's grouped-einsum decode path (llama.py) on raw payloads.
    B, Hkv, G, D = q.shape
    S = k.shape[1]
    kq = k.astype(q.dtype)
    vq = v.astype(q.dtype)
    q5 = q.reshape(B, 1, Hkv, G, D).transpose(0, 2, 3, 1, 4)  # [B,Hkv,G,1,D]
    logits = jnp.einsum("bhgqd,bkhd->bhgqk", q5, kq, preferred_element_type=jnp.float32)
    if ks is not None:
        logits = logits * jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, None, :]
    mask = jnp.where(jnp.arange(S)[None, :] <= pos[:, None], 0.0, jnp.finfo(jnp.float32).min)
    logits = logits * scale + mask[:, None, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        probs = probs * jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bhgqd", probs, vq)
    return out[:, :, :, 0, :]


def timed(fn, qs, args, iters, repeats=3):
    @jax.jit
    def run(qs, args):
        def body(c, qi):
            out = fn(qi, *args)
            return c + jnp.sum(out.astype(jnp.float32)), None

        c, _ = lax.scan(body, jnp.float32(0.0), qs)
        return c

    v1 = float(jax.device_get(run(qs, args)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(jax.device_get(run(qs, args)))
        best = min(best, time.time() - t0)
    return best / iters, v1


def main():
    from quanto_tpu.ops.pallas.flash_decode import flash_decode_call

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    B, S, Hkv, G, D = args.batch, args.ctx, args.hkv, args.groups, args.d

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hkv, G, D), jnp.bfloat16)
    qs = jnp.stack([q * (1.0 + i * 1e-3) for i in range(args.iters)])
    pos = jnp.full((B,), S - 1, jnp.int32)
    scale = D ** -0.5

    for name, dtype, scales in [("bf16", jnp.bfloat16, False), ("int8", jnp.int8, True)]:
        if dtype == jnp.int8:
            k = jax.random.randint(key, (B, S, Hkv, D), -127, 127, jnp.int8)
            v = jax.random.randint(key, (B, S, Hkv, D), -127, 127, jnp.int8)
        else:
            k = jax.random.normal(key, (B, S, Hkv, D), dtype)
            v = jax.random.normal(key, (B, S, Hkv, D), dtype)
        ks = vs = None
        if scales:
            ks = jnp.abs(jax.random.normal(key, (B, S, Hkv, 1))) * 0.01 + 0.001
            vs = jnp.abs(jax.random.normal(key, (B, S, Hkv, 1))) * 0.01 + 0.001

        payload = 2 * B * S * Hkv * D * k.dtype.itemsize + (8 * B * S * Hkv if scales else 0)
        ideal_us = payload / 819e9 * 1e6

        t_e, v_e = timed(lambda qi: einsum_attn(qi, k, v, ks, vs, pos, scale), qs, (), args.iters)
        t_k, v_k = timed(
            lambda qi: flash_decode_call(qi, k, v, ks, vs, pos), qs, (), args.iters
        )
        rel = abs(v_e - v_k) / (abs(v_e) + 1e-9)
        log(
            f"{name}: einsum {t_e*1e6:.1f} us | kernel {t_k*1e6:.1f} us "
            f"({t_e/t_k:.2f}x) | ideal {ideal_us:.1f} us "
            f"(kernel at {ideal_us/(t_k*1e6)*100:.0f}% of HBM BW) | checksum rel {rel:.2e}"
        )


if __name__ == "__main__":
    main()
