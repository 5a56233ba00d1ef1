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

Greedy mode: the output is then EXACTLY the target model's greedy
continuation (the classic speculative-decoding guarantee), which the tests
assert token-for-token.

Stochastic mode (`temperature > 0`): classic rejection sampling — draft
token x_i ~ q_i is accepted with probability min(1, p_i(x_i)/q_i(x_i)); on
the first rejection the replacement is drawn from the residual
norm(max(0, p_i - q_i)), and a full acceptance draws the bonus token from
p_k. Each emitted token is then distributed EXACTLY according to the
(temperature/top-k/top-p-warped) target distribution, independent of draft
quality (Leviathan et al., 2023; verified distributionally in the tests).
Both p and q use the same `make_logits_warp` filter so the guarantee applies
to the warped distributions the plain sampler would draw from.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax import lax


__all__ = [
    "SpeculativeGenerator",
    "make_speculative_decode_fn",
    "make_speculative_sample_decode_fn",
    "speculative_generate",
]


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


def make_speculative_sample_decode_fn(
    target_graphdef, draft_graphdef, n_rounds: int, k: int, warp=None
):
    """Build a jitted *stochastic* speculative decode step (rejection
    sampling). Same signature/returns as `make_speculative_decode_fn` with a
    trailing PRNG `key` argument. `warp(logits) -> f32 logits` applies
    temperature/top-k/top-p filtering (see `sampling.make_logits_warp`);
    emitted tokens are exact samples of softmax(warp(target logits))."""
    if warp is None:
        warp = lambda l: l.astype(jnp.float32)  # noqa: E731

    @jax.jit
    def spec_decode(t_state, d_state, tok, t_cache, d_cache, pos0, key):
        target = nnx.merge(target_graphdef, t_state)
        draft = nnx.merge(draft_graphdef, d_state)
        B = tok.shape[0]
        pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (B,))

        def round_body(carry, rkey):
            tok, pos, t_cache, d_cache = carry
            keys = jax.random.split(rkey, k + 2)

            # Draft k tokens ~ q_i, recording each full draft distribution
            # (needed for the acceptance test and the residual).
            def draft_body(c, dk):
                dtok, dpos, dc = c
                dlogits, dc = draft(dtok, dc, dpos)
                wl = warp(dlogits[:, -1])  # [B, V]
                nxt = jax.random.categorical(dk, wl, axis=-1).astype(dtok.dtype)[:, None]
                return (nxt, dpos + 1, dc), (nxt[:, 0], jax.nn.softmax(wl, axis=-1))

            (_, _, d_cache), (drafts, qs) = lax.scan(
                draft_body, (tok, pos, d_cache), keys[:k]
            )
            drafts = jnp.transpose(drafts)  # [B, k]
            qs = jnp.transpose(qs, (1, 0, 2))  # [B, k, V]
            # Keep the draft cache complete on full acceptance (see greedy).
            _, d_cache = draft(drafts[:, -1:], d_cache, pos + k)

            # One target forward gives p_0..p_k for all k+1 positions.
            seq = jnp.concatenate([tok, drafts], axis=1)  # [B, k+1]
            t_logits, t_cache = target(seq, t_cache, pos)
            ps = jax.nn.softmax(warp(t_logits), axis=-1)  # [B, k+1, V]

            # Accept draft i iff u_i < p_i(x_i)/q_i(x_i); written as
            # u*q < p to avoid the division. If q(x) underflows to 0
            # (impossible for a sampled token, barring float underflow) this
            # accepts whenever p > 0 — the correct limit of min(1, p/q).
            p_x = jnp.take_along_axis(ps[:, :k], drafts[..., None], axis=-1)[..., 0]
            q_x = jnp.take_along_axis(qs, drafts[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(keys[k], (B, k))
            accept = (u * q_x < p_x).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)  # [B], 0..k

            # Replacement from the residual norm(max(0, p-q)) at the first
            # rejected position; a zero q row is padded at index k so a full
            # acceptance draws the bonus token from p_k itself.
            qs_pad = jnp.concatenate([qs, jnp.zeros_like(ps[:, :1])], axis=1)
            p_sel = jnp.take_along_axis(ps, n_acc[:, None, None], axis=1)[:, 0]
            q_sel = jnp.take_along_axis(qs_pad, n_acc[:, None, None], axis=1)[:, 0]
            resid = jnp.maximum(p_sel - q_sel, 0.0)
            norm = jnp.sum(resid, axis=-1, keepdims=True)
            # norm == 0 only when p <= q pointwise (p == q): fall back to p.
            repl = jnp.where(norm > 0, resid / jnp.where(norm > 0, norm, 1.0), p_sel)
            correction = (
                jax.random.categorical(keys[k + 1], jnp.log(repl), axis=-1)
                .astype(tok.dtype)[:, None]
            )

            ar = jnp.arange(k + 1)[None, :]
            drafts_pad = jnp.concatenate([drafts, jnp.zeros_like(tok)], axis=1)
            block = jnp.where(
                ar < n_acc[:, None],
                drafts_pad,
                jnp.where(ar == n_acc[:, None], correction, 0),
            )
            counts = n_acc + 1
            return (correction, pos + counts, t_cache, d_cache), (block, counts)

        (tok, pos, t_cache, d_cache), (blocks, counts) = lax.scan(
            round_body,
            (tok, pos0, t_cache, d_cache),
            jax.random.split(key, n_rounds),
        )
        return (
            jnp.transpose(blocks, (1, 0, 2)),  # [B, R, k+1]
            jnp.transpose(counts),  # [B, R]
            t_cache,
            d_cache,
            pos,
        )

    return spec_decode


class SpeculativeGenerator:
    """Reusable speculative generation.

    Builds the jitted prefill and multi-round spec-step functions ONCE (per
    round count) and reuses them across `generate` calls, so repeated
    serving/benchmark calls pay no re-trace — the speculative analogue of
    building `serve.make_decode_fn` once. Captures the models' state at
    construction; rebuild after mutating weights (e.g. freeze()).
    """

    def __init__(
        self,
        target,
        draft,
        k: int = 4,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        from .sampling import make_logits_warp
        from .serve import make_prefill_fn

        self.target, self.draft, self.k = target, draft, k
        self._warp = (
            None if temperature == 0.0 else make_logits_warp(temperature, top_k, top_p)
        )
        self._t_graphdef, self._t_state = nnx.split(target)
        self._d_graphdef, self._d_state = nnx.split(draft)
        # Only the last position's logits are consumed from either prefill
        # (the draft's are discarded outright): last_only skips the
        # O(T*vocab) logits tensors at 128k-201k vocabs.
        self._t_prefill = make_prefill_fn(self._t_graphdef, last_only=True)
        self._d_prefill = make_prefill_fn(self._d_graphdef, last_only=True)
        self._spec_fns = {}

    def _spec_fn(self, rounds: int):
        fn = self._spec_fns.get(rounds)
        if fn is None:
            if self._warp is None:
                fn = make_speculative_decode_fn(
                    self._t_graphdef, self._d_graphdef, rounds, self.k
                )
            else:
                fn = make_speculative_sample_decode_fn(
                    self._t_graphdef, self._d_graphdef, rounds, self.k, self._warp
                )
            self._spec_fns[rounds] = fn
        return fn

    def generate(
        self,
        input_ids: jnp.ndarray,
        max_new_tokens: int,
        cache_len: Optional[int] = None,
        key=None,
    ) -> Tuple[jnp.ndarray, float]:
        """Generate; returns (ids, acceptance) — see `speculative_generate`."""
        k = self.k
        B, T = input_ids.shape
        rounds = max(1, -(-max_new_tokens // (k + 1)))
        # Worst-case cache bound: the host loop runs until the SLOWEST row
        # has max_new tokens (<= ceil((max_new-1)/rounds) chunks, each round
        # advancing a row by at most k+1), and every round writes k+1 slots
        # ahead of its start.
        chunks_bound = max(1, -(-(max_new_tokens - 1) // rounds))
        cache_len = cache_len or (T + 1 + k + chunks_bound * rounds * (k + 1))

        from .serve import make_cache

        t_state, d_state = self._t_state, self._d_state
        t_cache = make_cache(self.target, B, cache_len)
        d_cache = make_cache(self.draft, B, cache_len)
        logits, t_cache = self._t_prefill(t_state, input_ids, t_cache, 0)
        _, d_cache = self._d_prefill(d_state, input_ids, d_cache, 0)

        if self._warp is None:
            first = jnp.argmax(logits[:, -1], axis=-1).astype(input_ids.dtype)[:, None]
            step_keys = None
        else:
            key = key if key is not None else jax.random.PRNGKey(0)
            key, sub = jax.random.split(key)
            first = (
                jax.random.categorical(sub, self._warp(logits[:, -1]), axis=-1)
                .astype(input_ids.dtype)[:, None]
            )
            step_keys = key

        spec = self._spec_fn(rounds)
        produced = np.ones((B,), np.int64)  # `first` already emitted
        tok, pos = first, jnp.full((B,), T, jnp.int32)
        acc_total, acc_rounds = 0.0, 0
        rows = [[] for _ in range(B)]
        while (produced < max_new_tokens).any():
            if step_keys is None:
                blocks, counts, t_cache, d_cache, pos = spec(
                    t_state, d_state, tok, t_cache, d_cache, pos
                )
            else:
                step_keys, sub = jax.random.split(step_keys)
                blocks, counts, t_cache, d_cache, pos = spec(
                    t_state, d_state, tok, t_cache, d_cache, pos, sub
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
        rest = np.stack(
            [np.asarray(r[:n_rest], np.asarray(input_ids).dtype) for r in rows]
        )
        ids = np.concatenate([np.asarray(input_ids), np.asarray(first), rest], axis=1)
        acceptance = acc_total / (acc_rounds * k) if acc_rounds else 0.0
        return jnp.asarray(ids), acceptance


def speculative_generate(
    target,
    draft,
    input_ids: jnp.ndarray,
    max_new_tokens: int,
    k: int = 4,
    cache_len: Optional[int] = None,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    key=None,
) -> Tuple[jnp.ndarray, float]:
    """One-shot speculative generation; returns (ids, acceptance) where
    `acceptance` is the mean accepted-drafts-per-round / k.

    With `temperature == 0` (default) the output is identical to the target
    model's own greedy generation (`serve.generate`); with `temperature > 0`
    each token is an exact sample of the temperature/top-k/top-p-warped
    target distribution via rejection sampling. Either way the draft only
    changes the cost per token. Draft and target must share the
    tokenizer/vocab. For repeated calls (serving, benchmarking) build one
    `SpeculativeGenerator` and reuse it — this convenience wrapper re-traces
    the jitted functions on every invocation.

    Exactness caveat shared with every speculative implementation: "identical
    to greedy" holds up to the target's own numerics across forward shapes —
    the verify pass evaluates [B, k+1] tokens at once, and in low precision
    (bf16) an argmax near-tie can resolve differently than in the [B, 1]
    decode forward. Exact in f32; on random-weight bf16 models (near-uniform
    logits) occasional divergences are expected and benign.
    """
    gen = SpeculativeGenerator(
        target, draft, k, temperature=temperature, top_k=top_k, top_p=top_p
    )
    return gen.generate(input_ids, max_new_tokens, cache_len=cache_len, key=key)


def layerskip_draft(target, num_layers: int):
    """Self-speculative (layer-skip) draft: a `num_layers`-deep copy of the
    target SHARING its weights (embeddings, first `num_layers` transformer
    layers, final norm, lm head) — zero extra HBM, ~num_layers/L of the
    per-step weight traffic plus the head.

    This is the "Draft & Verify" self-drafting recipe (Zhang et al., 2023):
    no separate draft checkpoint, no training; the early-exit distribution
    is a usable proposal because verification makes output quality
    draft-independent (greedy: exact; sampling: exact in distribution).

    Works for any family whose constructor is `type(target)(config, rngs=)`
    with a dataclass config carrying `num_hidden_layers` and whose module
    paths for kept weights are identical in the shallow model (true for the
    llama family and its derivatives: layers are `model.layers[i]` and the
    final `model.norm`/`lm_head` keep their names).

    Returns the draft MODULE (weight-sharing); pass it as
    `SpeculativeGenerator(target, draft=layerskip_draft(target, k), ...)`.
    """
    import dataclasses

    from ..nn.qmodule import quantize_module
    from ..quantize import get_module_by_name, quantization_map, set_module_by_name

    cfg = dataclasses.replace(target.config, num_hidden_layers=num_layers)
    qmap = quantization_map(target)

    def build():
        m = type(target)(cfg, rngs=nnx.Rngs(0))
        # Mirror the target's quantized module structure (same recipe as
        # `requantize`): graphdef paths must match for state grafting.
        for name, c in qmap.items():
            weights = None if c["weights"] == "none" else c["weights"]
            activations = None if c["activations"] == "none" else c["activations"]
            try:
                mod = get_module_by_name(m, name)
            except (AttributeError, KeyError, IndexError):
                continue  # module lives in a dropped layer
            qm = quantize_module(mod, weights=weights, activations=activations, optimizer=None)
            if qm is not None:
                set_module_by_name(m, name, qm)
        return m

    abstract = nnx.eval_shape(build)
    d_graphdef, d_abs = nnx.split(abstract)
    _, t_state = nnx.split(target)
    t_flat = {tuple(p): v for p, v in t_state.flat_state()}
    picked = []
    missing = []
    for p, _abs_v in d_abs.flat_state():
        key = tuple(p)
        if key in t_flat:
            picked.append((key, t_flat[key]))
        else:
            missing.append(key)
    if missing:
        raise ValueError(
            f"layerskip_draft: target state lacks paths {missing[:3]}... — "
            "this family's shallow model is not path-compatible"
        )
    d_state = nnx.State.from_flat_path(picked)
    return nnx.merge(d_graphdef, d_state)
