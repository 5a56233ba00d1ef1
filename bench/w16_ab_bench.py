"""Same-session model-level A/B: int4 packed-payload DMA element width.

Hypothesis (RESULTS.md "streaming floor"): the decode kernel's packed uint8
weight blocks stream slower than 2-byte bf16 blocks purely because of DMA
element width. Test: repack the SAME nibbles as int16 words (4 codes/word,
"w16" layout: word j of row n holds code[n, j + p*(K/4)] in bits 4p..4p+3)
and A/B the full 1B W4A16 decode in one session. Microbenches cannot decide
this (degraded sessions flatten every variant to a common floor — RESULTS.md);
model-level interleaved rounds remain decision-grade.

Also measures W4A8+head4 (int8 activations + int4 head), the one lmhead_bench
combo never run.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python bench/w16_ab_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.serve import make_decode_fn
from quanto_tpu.ops.pallas import qbits_mm
from quanto_tpu.tensor.weights import WeightQBitsTpuArray

_CHUNK = 128


def pack_w16(codes: jnp.ndarray) -> jnp.ndarray:
    """codes [N, K] (0..15) -> int16 [N, K/4]; word j holds
    code[:, j + p*(K/4)] in bits 4p..4p+3."""
    N, K = codes.shape
    W = K // 4
    acc = jnp.zeros((N, W), jnp.int32)
    for p in range(4):
        acc = acc | (codes[:, p * W : (p + 1) * W].astype(jnp.int32) << (4 * p))
    return acc.astype(jnp.int16)


def _w16_kernel(x_ref, p_ref, s_ref, z_ref, out_ref, *, group_size):
    M = x_ref.shape[0]
    BN = p_ref.shape[0]
    W = p_ref.shape[1]
    nchunks = W // _CHUNK
    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(dot_dtype)
    y = jnp.zeros((M, BN), jnp.float32)
    for c in range(nchunks):
        # int16 -> int32 widen; words with a set top nibble are negative in
        # int16, so EVERY part is masked after the shift.
        b32 = p_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
        for part in range(4):
            raw = (b32 >> (4 * part)) & 15 if part else b32 & 15
            codes = raw.astype(dot_dtype)
            k0 = part * W + c * _CHUNK
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


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def _w16_call(x, packed16, scale_t, shift_t, *, group_size, interpret=False):
    M, K = x.shape
    N, W = packed16.shape
    G = scale_t.shape[0]
    bn = next(c for c in (1024, 512, 256, 128) if N % c == 0)
    kernel = functools.partial(_w16_kernel, group_size=group_size)
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
            bytes_accessed=N * W * 2 + M * K * x.dtype.itemsize + M * N * 4 + 2 * N * G * 4,
            transcendentals=0,
        ),
    )(x, packed16, scale_t, shift_t)


_ORIG_CALL = qbits_mm.qbits_matmul_kernel_call


def _patched_call(x, packed, scale_t, shift_t, bits, group_size, *, interpret=False):
    if packed.dtype != jnp.int16:
        return _ORIG_CALL(x, packed, scale_t, shift_t, bits, group_size, interpret=interpret)
    N, W = packed.shape
    K = W * 4
    gs = group_size if group_size is not None else K
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    if (
        bits != 4 or x.shape[-1] != K or N % 128 or W % _CHUNK
        or gs % _CHUNK or W % gs or M > 512
    ):
        raise RuntimeError(f"w16 gating failed: N={N} K={K} gs={gs} M={M}")
    x2 = x.reshape(M, K)
    m_pad = -M % 8
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    out = _w16_call(
        x2, packed, scale_t.astype(jnp.float32), shift_t.astype(jnp.float32),
        group_size=gs, interpret=interpret,
    )
    if m_pad:
        out = out[:M]
    return out.reshape(*lead, N).astype(x.dtype)


def to_layout_state(state, layout):
    """Rebuild every WeightQBitsTpuArray payload in the given layout
    ("w16" int16 words or "u8" split-half), independent of the production
    default (w16 was adopted as the default after this experiment)."""
    def conv(v):
        if not isinstance(v, WeightQBitsTpuArray):
            return v
        N, K = v.orig_shape
        codes = qbits_mm.unpack_split_half(v._packed, v.qtype.bits, K)
        packed = pack_w16(codes) if layout == "w16" else qbits_mm.pack_split_half(codes, v.qtype.bits)
        return WeightQBitsTpuArray(
            _packed=packed, _scale_t=v._scale_t, _shift_t=v._shift_t,
            qtype=v.qtype, group_size=v.group_size, orig_shape=v.orig_shape,
            float_dtype=v.float_dtype,
        )
    return jax.tree.map(conv, state, is_leaf=lambda v: isinstance(v, WeightQBitsTpuArray))


def kernel_check(interpret):
    """w16 kernel vs dequant reference on random weights."""
    rng = np.random.default_rng(0)
    M, K, N, gs = 8, 1024, 256, 128
    codes = rng.integers(0, 16, (N, K), dtype=np.uint8)
    G = K // gs
    scale = (rng.uniform(0.5, 1.5, (N, G)) / 8).astype(np.float32)
    shift = rng.uniform(-1, 1, (N, G)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    deq = (codes.reshape(N, G, gs) * scale[:, :, None] - shift[:, :, None]).reshape(N, K)
    ref = np.asarray(jnp.dot(x, jnp.asarray(deq, jnp.bfloat16).T,
                             preferred_element_type=jnp.float32))
    out = np.asarray(_patched_call(
        x, pack_w16(jnp.asarray(codes)), jnp.asarray(scale.T), jnp.asarray(shift.T),
        4, gs, interpret=interpret))
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    print(f"w16 kernel check: cos={cos:.6f}", flush=True)
    assert cos > 0.999


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    jax.jit(lambda x: x + 1)(jnp.zeros((8, 8))).block_until_ready()  # eat queue stall
    print(f"backend: {jax.default_backend()}", flush=True)

    kernel_check(interpret)
    # (production qbits_matmul_kernel_call handles int16 payloads natively
    # since the w16 layout was adopted; no monkeypatch needed anymore)

    if on_tpu:
        config = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=2048, dtype=jnp.bfloat16,
        )
        prompt_len, new_tokens, batch = 512, 128, 1
    else:
        config = LlamaConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=1024, dtype=jnp.float32,
        )
        prompt_len, new_tokens, batch = 32, 8, 1
    cache_len = prompt_len + new_tokens

    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    def bench_state(graphdef, state, tag):
        decode = make_decode_fn(graphdef, new_tokens)
        cache = init_kv_cache(config, batch, cache_len, config.dtype)
        first = jnp.zeros((batch, 1), jnp.int32)
        t0 = time.time()
        toks, _ = decode(state, first, cache, prompt_len)
        sync(toks)
        print(f"{tag}: warmup+compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            toks, _ = decode(state, first, cache, prompt_len)
            sync(toks)
            best = min(best, time.time() - t0)
        print(f"{tag}: {batch*new_tokens/best:.1f} tok/s "
              f"({best*1e3/new_tokens:.3f} ms/tok)", flush=True)
        return decode, state, cache, first, best

    runs = {}

    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    gd, st = nnx.split(model)
    runs["bf16"] = bench_state(gd, st, "bf16")

    # W4A16 + int4 head (current best config), both payload layouts
    qt.quantize(model, weights="qint4")
    qt.freeze(model)
    gd, st = nnx.split(model)
    runs["w4a16h4_u8"] = bench_state(gd, to_layout_state(st, "u8"), "w4a16h4_u8")
    runs["w4a16h4_w16"] = bench_state(gd, to_layout_state(st, "w16"), "w4a16h4_w16")

    # W4A8 + int4 head (never measured): int8 activations on the body
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", activations="qint8", exclude="lm_head")
    qt.quantize(model, weights="qint4", include="lm_head")
    ids = np.asarray(
        np.random.default_rng(1).integers(0, config.vocab_size, (4, 128)), np.int32
    )
    with qt.Calibration(model):
        model(jnp.asarray(ids))
    qt.freeze(model)
    gd8, st8 = nnx.split(model)
    # (payloads follow the production default layout — w16 since adoption)
    runs["w4a8h4"] = bench_state(gd8, st8, "w4a8h4")

    # Interleaved timed rounds (drift guard).
    times = {t: float("inf") for t in runs}
    for _ in range(5):
        for tag, (decode, state, cache, first, _) in runs.items():
            t0 = time.time()
            toks, _ = decode(state, first, cache, prompt_len)
            sync(toks)
            times[tag] = min(times[tag], time.time() - t0)
    print("\ninterleaved rounds (best of 5):", flush=True)
    base = times["bf16"]
    for tag, t in times.items():
        print(f"  {tag}: {batch*new_tokens/t:.1f} tok/s "
              f"({t*1e3/new_tokens:.3f} ms/tok, {base/t:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
