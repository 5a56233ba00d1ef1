"""Sliding-window perplexity (llama.cpp-style), jitted.

Analogue of the reference harness (`bench/generation/metrics/perplexity.py:23-229`):
chunked NLL over a token stream with a fixed window, each window's first half
treated as context (ignored in the loss) to approximate unconditional
perplexity. The token source is pluggable — pass any token id array; the
`synthetic_tokens` generator provides a deterministic offline corpus (zero
egress in this environment; with network access wire WikiText-2 in via
`datasets` exactly like the reference).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx


def synthetic_tokens(vocab_size: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic Markov-ish token stream a trained model could compress.

    Mixes short repeated motifs with noise so perplexity is neither trivial
    nor saturated — adequate for measuring quantization DELTAS (the headline
    metric: delta-ppl vs the float model), not absolute language ppl.
    """
    rng = np.random.RandomState(seed)
    motifs = [rng.randint(0, vocab_size, size=rng.randint(4, 12)) for _ in range(32)]
    out = []
    while sum(len(m) for m in out) < n_tokens:
        if rng.rand() < 0.8:
            out.append(motifs[rng.randint(len(motifs))])
        else:
            out.append(rng.randint(0, vocab_size, size=rng.randint(2, 6)))
    return np.concatenate(out)[:n_tokens]


def perplexity(
    model,
    tokens: np.ndarray,
    window: int = 512,
    context: int = 256,
    batch_windows: int = 4,
) -> float:
    """NLL-exp over sliding windows; the first `context` tokens of each
    window are context-only (reference `perplexity.py:150-210` semantics)."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def window_nll(state, ids):
        m = nnx.merge(graphdef, state)
        logits, _ = m(ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(ids.shape[1] - 1) >= context - 1).astype(jnp.float32)
        return jnp.sum(nll * mask[None, :]), jnp.sum(mask) * ids.shape[0]

    stride = window - context
    starts = list(range(0, len(tokens) - window, stride))
    total_nll, total_cnt = 0.0, 0.0
    for i in range(0, len(starts), batch_windows):
        chunk = starts[i : i + batch_windows]
        if len(chunk) < batch_windows:
            break  # keep shapes static: drop the ragged tail
        ids = jnp.asarray(
            np.stack([tokens[s : s + window] for s in chunk]).astype(np.int32)
        )
        nll, cnt = window_nll(state, ids)
        total_nll += float(jax.device_get(nll))
        total_cnt += float(jax.device_get(cnt))
    return float(np.exp(total_nll / max(total_cnt, 1.0)))
