"""Decode-attention A/B: int8x8 logits with quantized queries vs convert path.

VERDICT round-2 weak #1 / next #1: the einsum decode path's marginal cache
bandwidth is 282-551 GB/s vs the ~750 GB/s streaming roof, and the round-2
root-cause work identified the per-element int8->bf16 convert fused into the
einsum operand read as the suspected gate. This measures, attention-op-only
at 8B decode shapes (B=4, Hkv=8, G=4, D=128), the per-step cost of:

  A. convert path (today's default): int8 payload -> bf16 einsum, scales
     factored onto logits/probs
  B. int8 logits: quantize q per-row to int8, int8xint8->int32 QK^T on the
     MXU, scales on logits; PV stays convert-bf16
  C. full int path: B + quantize (probs * s_v) rows to int8, int8xint8->i32
     PV matmul
  D. bf16 cache reference

plus numerics (cosine vs f32 reference) for each. Each variant loops STEPS
iterations inside one jit with a carry-perturbed q so the cache streams from
HBM every iteration.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# Two-point timing: time a jit at STEPS_HI and STEPS_LO iterations and take
# the slope — this subtracts one-time costs inside the jit (notably the
# int8->s4 cache conversion that MUST happen in-jit: s4 arrays cannot cross
# the host<->device or jit-argument boundary on the axon backend, every
# attempt recurses in device_put).
STEPS_HI = 48
STEPS_LO = 16


def attn_convert(q5, kd, vd, ks, vs):
    """Today's path: payload -> bf16 fused convert, factored scales."""
    k = kd.astype(jnp.bfloat16)
    v = vd.astype(jnp.bfloat16)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q5, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, None, :]
    logits = logits * (q5.shape[-1] ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, None, :]
    probs = probs.astype(jnp.bfloat16)
    return jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)


def _quantize_rows(t, axis=-1):
    amax = jnp.max(jnp.abs(t), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    data = jnp.clip(jnp.round(t / scale), -127, 127).astype(jnp.int8)
    return data, scale


def attn_int8_logits(q5, kd, vd, ks, vs, int8_pv=False):
    qf = q5.astype(jnp.float32)
    qi, qs = _quantize_rows(qf)  # [B,1,H,G,D], scale [B,1,H,G,1]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qi, kd, preferred_element_type=jnp.int32)
    # combined scale: s_q per (b,h,g) x s_k per (b,s,h)
    sq = jnp.transpose(qs[:, 0, :, :, 0], (0, 1, 2))[:, :, :, None, None]  # [B,H,G,1,1]
    sk = jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, None, :]  # [B,H,1,1,S]
    logits = logits.astype(jnp.float32) * (sq * sk)
    logits = logits * (q5.shape[-1] ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    sv = jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, None, :]
    p_sc = probs * sv
    if int8_pv:
        pi, ps = _quantize_rows(p_sc)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", pi, vd, preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * jnp.transpose(ps, (0, 3, 1, 2, 4))
    return jnp.einsum("bhgqk,bkhd->bqhgd", p_sc.astype(jnp.bfloat16), vd.astype(jnp.bfloat16))


def attn_int4(q5, kd4, vd4, ks, vs, int_logits=True):
    """KV payload stored as XLA-native s4 (packed 2/byte in HBM); the s4->s8
    convert is left to XLA to fuse into the dot operand read."""
    kd = kd4.astype(jnp.int8)
    vd = vd4.astype(jnp.int8)
    if int_logits:
        return attn_int8_logits(q5, kd, vd, ks, vs, int8_pv=True)
    return attn_convert(q5, kd, vd, ks, vs)


def with_s4_cache(fn):
    """Wrap an attention fn so its int8 K/V payload args are converted to s4
    first — inside the jit, since s4 can't be a jit argument here. The
    conversion cost is subtracted by the two-point timing."""

    def wrapped(q5, kd8, vd8, *args):
        return fn(q5, kd8.astype(jnp.int4), vd8.astype(jnp.int4), *args)

    return wrapped


def attn_bf16(q5, k, v):
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q5, k, preferred_element_type=jnp.float32)
    logits = logits * (q5.shape[-1] ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)


def loop(fn, q5, *args, steps=STEPS_HI, s4=False):
    """Run fn `steps` times with a carry-perturbed q (defeats CSE). With
    s4=True the K/V payload args (int8) are converted to s4 once inside the
    jit before the scan."""

    def body(prepped):
        def _body(c, _):
            out = fn(q5 + c, *prepped)
            # Reduce over the WHOLE output: a single-element carry lets XLA
            # dead-code-eliminate all but one (batch, head) of the attention.
            c2 = jnp.min(out.astype(jnp.float32)).astype(jnp.bfloat16)
            return c2 * jnp.bfloat16(1e-6), ()

        c, _ = lax.scan(_body, jnp.bfloat16(0), None, length=steps)
        return c

    @jax.jit
    def g():
        if s4:
            kd8, vd8 = args[0], args[1]
            prepped = (kd8.astype(jnp.int4), vd8.astype(jnp.int4)) + args[2:]
        else:
            prepped = args
        return body(prepped)

    return g


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    B, Hkv, G, D = 4, 8, 4, 128
    for S in (2048, 8192):
        q5 = jnp.asarray(rng.standard_normal((B, 1, Hkv, G, D)), jnp.bfloat16)
        kf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
        vf = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
        # per-slot int8 quantization like the kv cache
        ks = np.maximum(np.abs(kf).max(-1, keepdims=True) / 127.0, 1e-8)
        vs = np.maximum(np.abs(vf).max(-1, keepdims=True) / 127.0, 1e-8)
        kd = jnp.asarray(np.clip(np.round(kf / ks), -127, 127), jnp.int8)
        vd = jnp.asarray(np.clip(np.round(vf / vs), -127, 127), jnp.int8)
        ksj, vsj = jnp.asarray(ks), jnp.asarray(vs)
        kb, vb = jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16)
        # int4 cache: same per-slot scheme with qmax=7; payload shipped to
        # the device as int8 and converted to s4 INSIDE each jit (s4 arrays
        # can't cross the jit/device boundary on this backend).
        ks4 = np.maximum(np.abs(kf).max(-1, keepdims=True) / 7.0, 1e-8)
        vs4 = np.maximum(np.abs(vf).max(-1, keepdims=True) / 7.0, 1e-8)
        kd4_8 = jnp.asarray(np.clip(np.round(kf / ks4), -7, 7), jnp.int8)
        vd4_8 = jnp.asarray(np.clip(np.round(vf / vs4), -7, 7), jnp.int8)
        ks4j, vs4j = jnp.asarray(ks4), jnp.asarray(vs4)

        # numerics vs f32 reference on the dequantized cache
        ref = attn_bf16(q5.astype(jnp.float32), jnp.asarray(kf), jnp.asarray(vf))
        for tag, out in (
            ("convert", jax.jit(attn_convert)(q5, kd, vd, ksj, vsj)),
            ("int8-logits", jax.jit(attn_int8_logits)(q5, kd, vd, ksj, vsj)),
            ("full-int8", jax.jit(lambda *a: attn_int8_logits(*a, int8_pv=True))(q5, kd, vd, ksj, vsj)),
            ("int4-intlogits", jax.jit(with_s4_cache(attn_int4))(q5, kd4_8, vd4_8, ks4j, vs4j)),
            ("int4-convert", jax.jit(with_s4_cache(lambda *a: attn_int4(*a, int_logits=False)))(q5, kd4_8, vd4_8, ks4j, vs4j)),
        ):
            print(f"S={S} {tag}: cosine={cosine(ref, out):.6f}", flush=True)

        cache_gb = 2 * B * S * Hkv * D / 1e9  # int8 K+V payload bytes

        def make(fn, *args, s4=False):
            return (
                loop(fn, *args, steps=STEPS_HI, s4=s4),
                loop(fn, *args, steps=STEPS_LO, s4=s4),
            )

        variants = {
            "bf16-cache": make(attn_bf16, q5, kb, vb),
            "convert": make(attn_convert, q5, kd, vd, ksj, vsj),
            "int8-logits": make(lambda q, *a: attn_int8_logits(q, *a), q5, kd, vd, ksj, vsj),
            "full-int8": make(lambda q, *a: attn_int8_logits(q, *a, int8_pv=True), q5, kd, vd, ksj, vsj),
            "int4-intlogits": make(attn_int4, q5, kd4_8, vd4_8, ks4j, vs4j, s4=True),
            "int4-convert": make(lambda q, *a: attn_int4(q, *a, int_logits=False), q5, kd4_8, vd4_8, ks4j, vs4j, s4=True),
        }
        for tag, (hi, lo) in variants.items():
            hi().block_until_ready()
            lo().block_until_ready()
            best_hi = best_lo = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                hi().block_until_ready()
                best_hi = min(best_hi, time.perf_counter() - t0)
                t0 = time.perf_counter()
                lo().block_until_ready()
                best_lo = min(best_lo, time.perf_counter() - t0)
            per_step = (best_hi - best_lo) / (STEPS_HI - STEPS_LO)
            width = 2 if tag == "bf16-cache" else (0.5 if tag.startswith("int4") else 1)
            bytes_gb = cache_gb * width
            print(
                f"S={S} {tag}: {per_step*1e6:8.1f} us/step, "
                f"{bytes_gb/per_step:6.0f} GB/s payload rate",
                flush=True,
            )


if __name__ == "__main__":
    main()
