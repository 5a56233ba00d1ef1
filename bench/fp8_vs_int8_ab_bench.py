"""Same-session interleaved A/B: fp8 vs int8 weight-only 1B llama decode.

RESULTS.md lists fp8 at 591 tok/s vs int8 708 (a -16% gap) measured across
grid runs; HLO inspection (bench/fp8_hlo_inspect.py) shows the two programs
are structurally IDENTICAL broadcast-multiply-reduce fusions differing only
in the per-element convert (f8e4m3->f32 vs s8->f32). This re-measures the
gap interleaved in one session to separate convert cost from session drift.
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    prompt_len, new_tokens, batch = 512, 128, 1
    cache_len = prompt_len + new_tokens

    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    def build(weights):
        model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
        if weights is not None:
            qt.quantize(model, weights=weights, exclude="lm_head")
            qt.freeze(model)
        graphdef, state = nnx.split(model)
        decode = make_decode_fn(graphdef, new_tokens)
        cache = init_kv_cache(config, batch, cache_len, config.dtype)
        first = jnp.zeros((batch, 1), jnp.int32)
        t0 = time.time()
        toks, _ = decode(state, first, cache, prompt_len)
        sync(toks)
        print(f"{weights}: warmup+compile {time.time()-t0:.1f}s", flush=True)
        return decode, state, cache, first

    runs = {tag: build(w) for tag, w in
            (("bf16", None), ("int8", "qint8"), ("fp8", "qfloat8"))}

    times = {t: float("inf") for t in runs}
    for _ in range(5):
        for tag, (decode, state, cache, first) in runs.items():
            t0 = time.time()
            toks, _ = decode(state, first, cache, prompt_len)
            sync(toks)
            times[tag] = min(times[tag], time.time() - t0)
    for tag, t in times.items():
        print(f"{tag}: {batch*new_tokens/t:.1f} tok/s ({t*1e3/new_tokens:.3f} ms/tok)")
    print(f"fp8 vs int8: {times['int8']/times['fp8']:.3f}x")


if __name__ == "__main__":
    main()
