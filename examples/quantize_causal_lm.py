"""Example: quantize a causal LM and generate.

Analogue of the reference's `examples/nlp/text-generation/quantize_causal_lm_model.py`.
Offline-friendly: without --model it builds a small random llama so the full
pipeline (quantize -> calibrate -> freeze -> generate -> save -> reload) can
be exercised anywhere.

    python examples/quantize_causal_lm.py --weights qint4 --out /tmp/qmodel
"""

from __future__ import annotations

import argparse
import sys
import tempfile

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="local HF checkpoint dir (optional)")
    p.add_argument("--weights", default="qint8",
                   choices=["qint2", "qint4", "qint8", "qfloat8_e4m3fn", "qfloat8_e5m2"])
    p.add_argument("--activations", default=None, choices=[None, "qint8", "qfloat8_e4m3fn"])
    p.add_argument("--out", default=None)
    p.add_argument("--new-tokens", type=int, default=16)
    args = p.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import (
        LlamaConfig,
        LlamaForCausalLM,
        QuantizedModelForCausalLM,
        from_pretrained_float,
    )
    from quanto_tpu.models.serve import generate

    if args.model:
        model = from_pretrained_float(args.model, dtype=jnp.bfloat16)
    else:
        config = LlamaConfig(
            vocab_size=1024, hidden_size=256, intermediate_size=512,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
            max_position_embeddings=512, dtype=jnp.float32,
        )
        model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))

    prompt = np.random.RandomState(0).randint(0, model.config.vocab_size, (1, 12)).astype(np.int32)

    print(f"quantizing: weights={args.weights} activations={args.activations}", file=sys.stderr)
    qt.quantize(model, weights=args.weights, activations=args.activations, exclude="lm_head")
    if args.activations is not None:
        import jax.numpy as jnp

        with qt.Calibration(model):
            model(jnp.asarray(prompt))
    qt.freeze(model)

    out = generate(model, prompt, args.new_tokens)
    print("generated token ids:", np.asarray(out)[0].tolist())

    out_dir = args.out or tempfile.mkdtemp(prefix="quanto_tpu_")
    QuantizedModelForCausalLM(model).save_pretrained(out_dir)
    reloaded = QuantizedModelForCausalLM.from_pretrained(
        out_dir, dtype=model.config.dtype
    )
    out2 = generate(reloaded._wrapped, prompt, args.new_tokens)
    assert np.array_equal(np.asarray(out), np.asarray(out2))
    print(f"saved + reloaded identically from {out_dir}")


if __name__ == "__main__":
    main()
