"""Per-token decode latency (analogue of the reference
`bench/generation/metrics/latency.py:24-80`: batch 1, prompt 512, 512 new
tokens, explicit synchronization), built on the jitted scan decoder."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import nnx


def decode_latency(
    model,
    prompt_len: int = 512,
    new_tokens: int = 128,
    batch: int = 1,
    iterations: int = 3,
) -> dict:
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn

    graphdef, state = nnx.split(model)
    decode = make_decode_fn(graphdef, new_tokens)
    if hasattr(model, "init_kv_cache"):
        cache = model.init_kv_cache(batch, prompt_len + new_tokens)
    else:
        cache = init_kv_cache(model.config, batch, prompt_len + new_tokens)
    first = jnp.zeros((batch, 1), jnp.int32)

    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    toks, _ = decode(state, first, cache, prompt_len)
    sync(toks)  # compile + warm
    best = float("inf")
    for _ in range(iterations):
        t0 = time.time()
        toks, _ = decode(state, first, cache, prompt_len)
        sync(toks)
        best = min(best, time.time() - t0)
    return {
        "ms_per_token": best * 1e3 / new_tokens,
        "tokens_per_s": batch * new_tokens / best,
    }
