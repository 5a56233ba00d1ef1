"""Speculative decoding: a small (typically more-aggressively-quantized)
draft model proposes k tokens per round; the target model verifies all k+1
positions in ONE batched forward and keeps the longest matching prefix plus
one corrected/bonus token.

Beyond the torch reference (which has no serving loop at all); pairs
naturally with quantization: an int4 draft of the same family runs ~2x
faster than the bf16/int8 target (RESULTS.md), so accepted drafts convert
the target's per-token HBM cost into one verify pass per k+1 tokens.

TPU-native structure: the whole multi-round loop is ONE jitted `lax.scan`
with static shapes — each round drafts k tokens (inner scan), verifies with
a single [B, k+1] target forward, and computes the accepted length with a
cumprod mask. Per-batch-row positions ([B] vectors, supported by every model
family and `kv_update`) let rows accept different amounts. Rejected cache
slots are never cleaned: both caches are rewritten by the next round's write
window before any query can attend them (write offset only moves forward,
and the causal mask hides everything at or beyond the current query
position).

Greedy only: the output is then EXACTLY the target model's greedy
continuation (the classic speculative-decoding guarantee), which the tests
assert token-for-token. Stochastic rejection sampling is a planned
extension.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax import lax


__all__ = ["make_speculative_decode_fn", "speculative_generate"]


def make_speculative_decode_fn(target_graphdef, draft_graphdef, n_rounds: int, k: int):
    """Build a jitted speculative decode step.

    Returns fn(t_state, d_state, tok [B,1], t_cache, d_cache, pos0) ->
    (blocks [B, R, k+1], counts [B, R], t_cache, d_cache, pos [B]) where each
    round contributes `counts[b, r]` valid tokens in `blocks[b, r, :]`
    (accepted drafts then the correction/bonus token). `tok` must already be
    an emitted token (e.g. the argmax of the prefill logits) whose KV is not
    yet written; `pos0` is its position.
    """

    @jax.jit
    def spec_decode(t_state, d_state, tok, t_cache, d_cache, pos0):
        target = nnx.merge(target_graphdef, t_state)
        draft = nnx.merge(draft_graphdef, d_state)
        B = tok.shape[0]
        pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (B,))

        def round_body(carry, _):
            tok, pos, t_cache, d_cache = carry

            # Draft k tokens autoregressively (k cheap forwards).
            def draft_body(c, _):
                dtok, dpos, dc = c
                dlogits, dc = draft(dtok, dc, dpos)
                nxt = jnp.argmax(dlogits[:, -1], axis=-1).astype(dtok.dtype)[:, None]
                return (nxt, dpos + 1, dc), nxt[:, 0]

            (_, _, d_cache), drafts = lax.scan(
                draft_body, (tok, pos, d_cache), None, length=k
            )
            drafts = jnp.transpose(drafts)  # [B, k]
            # Write the last draft's KV so a full acceptance leaves the draft
            # cache complete up to the next round's start position.
            _, d_cache = draft(drafts[:, -1:], d_cache, pos + k)

            # One target forward verifies all k+1 positions.
            seq = jnp.concatenate([tok, drafts], axis=1)  # [B, k+1]
            t_logits, t_cache = target(seq, t_cache, pos)
            preds = jnp.argmax(t_logits, axis=-1).astype(tok.dtype)  # [B, k+1]

            # Accepted drafted tokens: longest prefix where the target agrees.
            match = (preds[:, :k] == drafts).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B], 0..k
            correction = jnp.take_along_axis(preds, n_acc[:, None], axis=1)  # [B, 1]

            ar = jnp.arange(k + 1)[None, :]
            drafts_pad = jnp.concatenate([drafts, jnp.zeros_like(tok)], axis=1)
            block = jnp.where(
                ar < n_acc[:, None],
                drafts_pad,
                jnp.where(ar == n_acc[:, None], correction, 0),
            )  # [B, k+1]
            counts = n_acc + 1
            return (correction, pos + counts, t_cache, d_cache), (block, counts)

        (tok, pos, t_cache, d_cache), (blocks, counts) = lax.scan(
            round_body, (tok, pos0, t_cache, d_cache), None, length=n_rounds
        )
        return (
            jnp.transpose(blocks, (1, 0, 2)),  # [B, R, k+1]
            jnp.transpose(counts),  # [B, R]
            t_cache,
            d_cache,
            pos,
        )

    return spec_decode


def speculative_generate(
    target,
    draft,
    input_ids: jnp.ndarray,
    max_new_tokens: int,
    k: int = 4,
    cache_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, float]:
    """Greedy generation via speculative decoding; returns (ids, acceptance)
    where `acceptance` is the mean accepted-drafts-per-round / k.

    Output tokens are identical to the target model's own greedy generation
    (`serve.generate`); the draft only changes the cost per token. Draft and
    target must share the tokenizer/vocab.
    """
    from .llama import init_kv_cache
    from .serve import make_prefill_fn

    B, T = input_ids.shape
    rounds = max(1, -(-max_new_tokens // (k + 1)))
    # Worst-case cache bound: the host loop runs until the SLOWEST row has
    # max_new tokens (<= ceil((max_new-1)/rounds) chunks, each round
    # advancing a row by at most k+1), and every round writes k+1 slots
    # ahead of its start.
    chunks_bound = max(1, -(-(max_new_tokens - 1) // rounds))
    cache_len = cache_len or (T + 1 + k + chunks_bound * rounds * (k + 1))

    t_graphdef, t_state = nnx.split(target)
    d_graphdef, d_state = nnx.split(draft)

    def make_cache(model, cache_len):
        if hasattr(model, "init_kv_cache"):
            return model.init_kv_cache(B, cache_len)
        return init_kv_cache(model.config, B, cache_len)

    t_cache = make_cache(target, cache_len)
    d_cache = make_cache(draft, cache_len)

    t_prefill = make_prefill_fn(t_graphdef)
    d_prefill = make_prefill_fn(d_graphdef)
    logits, t_cache = t_prefill(t_state, input_ids, t_cache, 0)
    _, d_cache = d_prefill(d_state, input_ids, d_cache, 0)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(input_ids.dtype)[:, None]

    spec = make_speculative_decode_fn(t_graphdef, d_graphdef, rounds, k)

    out = [np.asarray(input_ids), np.asarray(first)]
    produced = np.ones((B,), np.int64)  # `first` already emitted
    tok, pos = first, jnp.full((B,), T, jnp.int32)
    acc_total, acc_rounds = 0.0, 0
    rows = [[] for _ in range(B)]
    while (produced < max_new_tokens).any():
        blocks, counts, t_cache, d_cache, pos = spec(
            t_state, d_state, tok, t_cache, d_cache, pos
        )
        blocks_h, counts_h = np.asarray(blocks), np.asarray(counts)
        for b in range(B):
            for r in range(counts_h.shape[1]):
                rows[b].extend(blocks_h[b, r, : counts_h[b, r]].tolist())
        produced = 1 + np.asarray([len(r) for r in rows])
        acc_total += float(counts_h.sum() - counts_h.size)  # accepted drafts
        acc_rounds += counts_h.size
        # Continue from the last correction token of the final round.
        last_counts = counts_h[:, -1]
        tok = jnp.asarray(
            blocks_h[np.arange(B), -1, last_counts - 1], input_ids.dtype
        )[:, None]
    n_rest = max_new_tokens - 1
    rest = np.stack([np.asarray(r[:n_rest], np.asarray(input_ids).dtype) for r in rows])
    ids = np.concatenate([np.asarray(input_ids), np.asarray(first), rest], axis=1)
    acceptance = acc_total / (acc_rounds * k) if acc_rounds else 0.0
    return jnp.asarray(ids), acceptance
