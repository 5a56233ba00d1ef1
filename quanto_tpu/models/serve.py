"""Jitted serving helpers: prefill + scan-based greedy decode.

TPU-native serving shape: the whole decode loop lives inside one jitted
`lax.scan`, so a single device call generates N tokens — weights and KV cache
never leave HBM and there is no per-token host round-trip (the torch
reference generates token-by-token from Python, `bench/generation/metrics/latency.py`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax


__all__ = ["make_cache", "make_prefill_fn", "make_decode_fn", "make_stacked_fns", "generate"]


def make_cache(model, batch: int, cache_len: int, dtype=None, kv_quant=None):
    """KV cache for any model family: the model's own `init_kv_cache` when it
    defines one, else the llama-family layout from its config."""
    from .llama import init_kv_cache

    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    if kv_quant is not None:
        kwargs["kv_quant"] = kv_quant
    if hasattr(model, "init_kv_cache"):
        return model.init_kv_cache(batch, cache_len, **kwargs)
    return init_kv_cache(model.config, batch, cache_len, **kwargs)


def make_prefill_fn(graphdef, last_only: bool = False):
    """Jitted prefill: (state, ids [B,T], cache, pos0) -> (logits, cache).

    `last_only`: compute logits only at the final position ([B, 1, V]) for
    models supporting `logits_indices` — skips the O(T*vocab) logits tensor
    and (T-1)/T of the lm_head matmul (use when only the next-token logits
    matter; perplexity-style callers need the default full logits)."""

    @jax.jit
    def prefill(state, ids, cache, pos0=0):
        import inspect

        model = nnx.merge(graphdef, state)
        if last_only and "logits_indices" in inspect.signature(
            type(model).__call__
        ).parameters:
            return model(ids, cache, pos0, logits_indices=ids.shape[1] - 1)
        return model(ids, cache, pos0)

    return prefill


def make_decode_fn(graphdef, n_tokens: int, sample_fn=None):
    """Jitted decode of `n_tokens` via lax.scan (single device call).

    Greedy by default; pass `sample_fn(logits, key) -> ids` (see
    `models.sampling.make_sampler`) for stochastic sampling. Returns
    fn(state, tok [B,1], cache, pos0[, key]) -> (tokens [B,n], cache).
    """
    from .sampling import greedy

    sampler = sample_fn or greedy

    @jax.jit
    def decode(state, tok, cache, pos0, key=None):
        model = nnx.merge(graphdef, state)
        # Default key is folded with the start position so repeated calls
        # (chunked generation) do not replay identical sampling randomness;
        # pass `key` explicitly for reproducible / properly seeded sampling.
        key0 = (
            key
            if key is not None
            else jax.random.fold_in(jax.random.PRNGKey(0), jnp.asarray(pos0).sum())
        )

        def body(carry, _):
            tok, pos, cache, key = carry
            logits, cache = model(tok, cache, pos)
            key, sub = jax.random.split(key)
            nxt = sampler(logits[:, -1], sub).astype(tok.dtype)[:, None]
            return (nxt, pos + 1, cache, key), nxt[:, 0]

        (_, _, cache, _), toks = lax.scan(
            body, (tok, jnp.asarray(pos0), cache, key0), None, length=n_tokens
        )
        return jnp.transpose(toks), cache  # [B, n]

    return decode


def make_stacked_fns(model, n_tokens: int, sample_fn=None):
    """Scan-over-layers prefill + decode (compile-time path, see
    `models/scan.py`: one compiled layer body instead of L unrolled copies).

    Returns (runner, prefill, decode):
        prefill(state, ids, cache, pos0) -> (logits, cache)
        decode(state, tok, cache, pos0[, key]) -> (tokens [B, n], cache)
    with `state = runner.state` and stacked caches from
    `runner.init_kv_cache`.
    """
    from .sampling import greedy
    from .scan import stack_model

    runner = stack_model(model)
    sampler = sample_fn or greedy

    @jax.jit
    def prefill(state, ids, cache, pos0=0):
        return runner.apply(state, ids, cache, pos0)

    @jax.jit
    def decode(state, tok, cache, pos0, key=None):
        key0 = (
            key
            if key is not None
            else jax.random.fold_in(jax.random.PRNGKey(0), jnp.asarray(pos0).sum())
        )

        def body(carry, _):
            tok, pos, cache, key = carry
            logits, cache = runner.apply(state, tok, cache, pos)
            key, sub = jax.random.split(key)
            nxt = sampler(logits[:, -1], sub).astype(tok.dtype)[:, None]
            return (nxt, pos + 1, cache, key), nxt[:, 0]

        (_, _, cache, _), toks = lax.scan(
            body, (tok, jnp.asarray(pos0), cache, key0), None, length=n_tokens
        )
        return jnp.transpose(toks), cache

    return runner, prefill, decode


def generate(model, input_ids: jnp.ndarray, max_new_tokens: int, cache_len: Optional[int] = None):
    """Greedy generation with jitted prefill + scan decode.

    Unlike `LlamaForCausalLM.generate` (eager, one device call per token),
    this compiles exactly two programs regardless of sequence length.
    """
    B, T = input_ids.shape
    cache_len = cache_len or (T + max_new_tokens)
    graphdef, state = nnx.split(model)
    cache = make_cache(model, B, cache_len)
    prefill = make_prefill_fn(graphdef)
    decode = make_decode_fn(graphdef, max_new_tokens - 1)
    logits, cache = prefill(state, input_ids, cache, 0)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(input_ids.dtype)[:, None]
    rest, cache = decode(state, first, cache, T)
    return jnp.concatenate([input_ids, first, rest], axis=1)
