"""Self-speculative decoding bench: the draft is an int4-quantized copy of
the target's own weights (no second checkpoint needed), so acceptance is
naturally high — int4 rarely flips the greedy argmax — and every accepted
draft token replaces a full-width target step with 1/(k+1) of a verify pass.

Reports tok/s for plain scan decode vs speculative decode at several k, plus
the measured acceptance rate. Same-run comparisons only (RESULTS.md).
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
from quanto_tpu.models.serve import generate
from quanto_tpu.models.speculative import speculative_generate


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

    def timed(fn):
        t0 = time.time()
        out = fn()
        ids_out = out[0] if isinstance(out, tuple) else out
        jax.device_get(jnp.sum(ids_out))
        warm = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn()
            ids_out = out[0] if isinstance(out, tuple) else out
            jax.device_get(jnp.sum(ids_out))
            best = min(best, time.time() - t0)
        return out, best, warm

    ref, sec, warm = timed(lambda: generate(target, ids, args.new_tokens))
    base_tps = args.new_tokens / sec
    print(f"target plain decode     : {base_tps:8.1f} tok/s ({sec*1e3/args.new_tokens:6.2f} ms/tok, warmup {warm:.0f}s)")

    for k in (3, 5, 7):
        (out, acc), sec, warm = timed(
            lambda: speculative_generate(target, draft, ids, args.new_tokens, k=k)
        )
        match = bool(jnp.all(out[:, : ref.shape[1]] == ref))
        tps = args.new_tokens / sec
        print(
            f"speculative k={k}         : {tps:8.1f} tok/s ({sec*1e3/args.new_tokens:6.2f} ms/tok, "
            f"acceptance {acc:.2f}, exact-match {match}, {tps/base_tps:.2f}x, warmup {warm:.0f}s)"
        )


if __name__ == "__main__":
    main()
