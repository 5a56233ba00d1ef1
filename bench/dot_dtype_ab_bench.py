"""Same-session A/B: int4 Pallas kernel dot dtype (f32 vs bf16) at model level.

The tunnel adds a session-dependent additive offset to small-program timings
(RESULTS.md), so cross-session kernel comparisons are unreliable; this runs
bf16 baseline + both kernel variants in ONE session. Interleaved A/B/A/B
ordering guards against within-session drift.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.serve import make_decode_fn
from quanto_tpu.ops.pallas import qbits_mm


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")

    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    prompt_len, new_tokens, batch = 512, 128, 1
    cache_len = prompt_len + new_tokens

    def bench_model(model, tag):
        graphdef, state = nnx.split(model)
        decode = make_decode_fn(graphdef, new_tokens)
        cache = init_kv_cache(config, batch, cache_len, config.dtype)
        first = jnp.zeros((batch, 1), jnp.int32)

        def sync(x):
            return int(jax.device_get(jnp.sum(x)))

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
        tps = batch * new_tokens / best
        print(f"{tag}: {tps:.1f} tok/s ({best*1e3/new_tokens:.2f} ms/tok)", flush=True)
        return decode, state, cache, first, tps

    print("bf16 baseline (session health check)...", flush=True)
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    _, _, _, _, bf16_tps = bench_model(model, "bf16")

    qt.quantize(model, weights="qint4", exclude="lm_head")
    qt.freeze(model)

    # Compile both variants up front (make_decode_fn re-traces per call, so
    # each picks up the flag at its own trace time).
    runs = {}
    for dtype, tag in ((jnp.float32, "int4/f32-dots"), (jnp.bfloat16, "int4/bf16-dots")):
        qbits_mm._FORCE_DOT_DTYPE = dtype
        runs[tag] = bench_model(model, tag + " (warm)")[:4]
    qbits_mm._FORCE_DOT_DTYPE = None

    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    # Interleaved timed rounds.
    times = {t: float("inf") for t in runs}
    for _ in range(5):
        for tag, (decode, state, cache, first) in runs.items():
            t0 = time.time()
            toks, _ = decode(state, first, cache, prompt_len)
            sync(toks)
            times[tag] = min(times[tag], time.time() - t0)
    for tag, t in times.items():
        print(f"{tag}: {batch*new_tokens/t:.1f} tok/s ({t*1e3/new_tokens:.3f} ms/tok)")
    print(f"bf16 baseline: {bf16_tps:.1f} tok/s")


if __name__ == "__main__":
    main()
