"""Self-speculative decoding bench: the draft is an int4-quantized copy of
the target's own weights (no second checkpoint needed), so every accepted
draft token replaces a full-width target step with 1/(k+1) of a verify pass.

Methodology: all jitted functions (plain decode, spec step) are built ONCE
and the timed loop reuses them — `speculative_generate`'s convenience
wrapper re-traces per call, which at 1B scale costs seconds of host time
and swamps the device time (this bench's first version showed exactly
that). Reports tok/s for plain scan decode vs speculative decode at several
k, plus the measured acceptance rate. Same-run comparisons only
(RESULTS.md).

Caveat: with RANDOM weights the logits are near-uniform, so the int4
draft's argmax agrees with the target far less often than on a trained
checkpoint (measured ~0.2 here vs 0.7+ typical for real models) —
acceptance (and therefore any speedup) from this bench is a LOWER bound on
real-model behavior; the tok/s mechanics (cost per round vs plain steps)
are the transferable signal.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serve import make_cache, make_decode_fn, make_prefill_fn
from quanto_tpu.models.speculative import SpeculativeGenerator


def sync(x):
    return float(jax.device_get(jnp.sum(x)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--prompt", type=int, default=32)
    p.add_argument("--target", default="bf16", choices=["bf16", "qint8"])
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        config = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=4096, dtype=jnp.bfloat16,
        )
    else:
        config = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=1024, dtype=jnp.float32,
        )

    target = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    if args.target == "qint8":
        qt.quantize(target, weights="qint8", exclude="lm_head")
        qt.freeze(target)

    # Draft: int4 copy of the SAME weights.
    draft = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(draft, weights="qint4", exclude="lm_head")
    qt.freeze(draft)

    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, config.vocab_size, (1, args.prompt)),
        jnp.int32,
    )
    n_new = args.new_tokens

    # --- plain decode baseline: prefill + scan decode, fns built once ---
    graphdef, state = nnx.split(target)
    prefill = make_prefill_fn(graphdef)
    decode = make_decode_fn(graphdef, n_new - 1)
    cache0 = make_cache(target, 1, args.prompt + n_new)

    def plain():
        logits, cache = prefill(state, ids, cache0, 0)
        first = jnp.argmax(logits[:, -1], axis=-1).astype(ids.dtype)[:, None]
        rest, _ = decode(state, first, cache, args.prompt)
        return jnp.concatenate([ids, first, rest], axis=1)

    def timed(fn, repeats=3):
        out = fn()
        ids_out = out[0] if isinstance(out, tuple) else out
        sync(ids_out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            ids_out = out[0] if isinstance(out, tuple) else out
            sync(ids_out)
            best = min(best, time.time() - t0)
        return out, best

    t0 = time.time()
    ref, sec = timed(plain)
    base_tps = n_new / sec
    print(
        f"target plain decode     : {base_tps:8.1f} tok/s "
        f"({sec*1e3/n_new:6.2f} ms/tok, total incl. compile {time.time()-t0:.0f}s)"
    )

    for k in (3, 5, 7):
        gen = SpeculativeGenerator(target, draft, k=k)
        (out, acc), sec = timed(lambda: gen.generate(ids, n_new))
        match = bool(jnp.all(out[:, : ref.shape[1]] == ref))
        tps = n_new / sec
        print(
            f"speculative k={k}         : {tps:8.1f} tok/s ({sec*1e3/n_new:6.2f} ms/tok, "
            f"acceptance {acc:.2f}, exact-match {match}, {tps/base_tps:.2f}x)"
        )


if __name__ == "__main__":
    main()
