"""Token sampling strategies for the serving loops.

The torch reference delegates generation to transformers' `generate`; the
TPU build owns its decode loop, so sampling lives here. All samplers are
jit-friendly (static shapes, PRNG keys threaded explicitly) and plug into
`serve.make_decode_fn(sample_fn=...)` / `BatchedEngine(sample_fn=...)`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


__all__ = ["greedy", "make_logits_warp", "make_sampler"]


def greedy(logits: jnp.ndarray, key=None) -> jnp.ndarray:
    """argmax over the vocab (logits [..., V] -> ids [...])."""
    return jnp.argmax(logits, axis=-1)


def make_logits_warp(
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> Callable:
    """Logits filter fn(logits [..., V]) -> f32 logits with temperature
    scaling and top-k / nucleus masking applied (masked entries -> -inf).
    `softmax(warp(logits))` is the distribution the samplers draw from —
    shared between `make_sampler` and speculative rejection sampling so
    both see identical target distributions. temperature must be > 0."""

    def warp(logits: jnp.ndarray) -> jnp.ndarray:
        logits = logits.astype(jnp.float32) / temperature
        if top_k is not None:
            # [..., -k:][..., :1] rather than [..., -k:-k+1]: the latter is an
            # empty slice when k == 1.
            kth = jnp.sort(logits, axis=-1)[..., -top_k:][..., :1]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p is not None:
            sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # Keep the smallest set of tokens with cumulative prob >= top_p
            # (always keep the first).
            keep = cum - probs < top_p
            cutoff = jnp.min(
                jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
            )
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        return logits

    return warp


def make_sampler(
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> Callable:
    """Categorical sampler with temperature / top-k / nucleus filtering.

    Returns fn(logits [..., V], key) -> ids [...]. With temperature == 0 the
    sampler degenerates to greedy.
    """
    if temperature == 0.0:
        return greedy

    warp = make_logits_warp(temperature, top_k, top_p)

    def sample(logits: jnp.ndarray, key) -> jnp.ndarray:
        return jax.random.categorical(key, warp(logits), axis=-1)

    return sample
