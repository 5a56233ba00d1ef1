"""Evaluate a model over the quantization configuration grid.

Analogue of the reference driver
(`bench/generation/evaluate_configurations.py:28-60`): float baseline plus
W in {int4, int8, float8} x A in {none, float8/int8}, reporting perplexity
delta vs float and per-token latency for each. lm_head stays unquantized
(reference `bench/generation/README.md:11`).

Usage:
    python bench/generation/evaluate.py [--model DIR] [--metric ppl|latency|all]

Without --model, a randomly initialized 1B-class llama is used (offline
environment: deltas and latency are still meaningful; absolute ppl is not).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


CONFIGS = [
    ("bf16", None, None),
    ("W8A16", "qint8", None),
    ("W4A16", "qint4", None),
    ("Wf8A16", "qfloat8_e4m3fn", None),
    ("W8A8", "qint8", "qint8"),
    ("W4A8", "qint4", "qint8"),  # fused int8-MXU Pallas kernel path
    ("Wf8Af8", "qfloat8_e4m3fn", "qfloat8_e4m3fn"),
]


def main():
    import jax.numpy as jnp
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM, from_pretrained_float

    sys.path.insert(0, "bench")
    from generation.fidelity import logits_fidelity, weight_sqnr_db
    from generation.latency import decode_latency
    from generation.perplexity import perplexity, synthetic_tokens

    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="local HF checkpoint dir")
    p.add_argument(
        "--metric", choices=["ppl", "latency", "fidelity", "all"], default="all",
        help="fidelity = per-layer weight SQNR + logits KL / top-k agreement "
        "vs the float model (sensitive even with random weights)",
    )
    p.add_argument("--tokens", type=int, default=16384)
    p.add_argument("--small", action="store_true", help="tiny model (CPU smoke)")
    args = p.parse_args()

    def fresh_model():
        if args.model:
            return from_pretrained_float(args.model, dtype=jnp.bfloat16)
        if args.small:
            cfg = LlamaConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=1024,
                              dtype=jnp.float32)
        else:
            cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                              num_hidden_layers=16, num_attention_heads=32,
                              num_key_value_heads=8, max_position_embeddings=2048,
                              dtype=jnp.bfloat16)
        return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))

    probe = fresh_model()
    vocab = probe.config.vocab_size
    tokens = synthetic_tokens(vocab, args.tokens)
    window = 256 if args.small else 512
    fidelity = args.metric in ("fidelity", "all")
    float_ref = probe if fidelity else None
    del probe
    results = {}
    float_ppl = None
    for name, weights, activations in CONFIGS:
        model = fresh_model()
        row = {}
        if weights is not None:
            qt.quantize(model, weights=weights, activations=activations, exclude="lm_head")
            if activations is not None:
                ids = np.stack([tokens[i * 128 : (i + 1) * 128] for i in range(4)])
                with qt.Calibration(model):
                    model(jnp.asarray(ids.astype(np.int32)))
            if fidelity:
                sqnr = weight_sqnr_db(model)
                row["sqnr_min"] = min(sqnr.values())
                row["sqnr_mean"] = float(np.mean(list(sqnr.values())))
            qt.freeze(model)
            if fidelity:
                row.update(logits_fidelity(model, float_ref, tokens))
        if args.metric in ("ppl", "all"):
            row["ppl"] = perplexity(model, tokens, window=window, context=window // 2)
            if name == "bf16":
                float_ppl = row["ppl"]
            if float_ppl:
                row["dppl"] = row["ppl"] - float_ppl
        if args.metric in ("latency", "all"):
            lat = decode_latency(
                model,
                prompt_len=64 if args.small else 512,
                new_tokens=32 if args.small else 128,
            )
            row.update(lat)
        results[name] = row
        print(f"{name:8s} " + " ".join(f"{k}={v:.4g}" for k, v in row.items()), file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
