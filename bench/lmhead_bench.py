"""Quantized-lm-head experiment: the LM head is the largest remaining bf16
weight stream in W4A16 decode (32000x2048 bf16 = 131 MB/step of ~660 MB).

The reference's bench protocol excludes lm_head from quantization
(`bench/generation/README.md:11`); this measures what quantizing it buys on
TPU — both speed (tok/s) and quality (sliding-window ppl delta).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python bench/lmhead_bench.py
"""

from __future__ import annotations

import json
import sys
import time

CONFIGS = [
    # (name, body weights, activations, head weights)
    ("bf16", None, None, None),
    ("W4A16", "qint4", None, None),
    ("W4A16+head8", "qint4", None, "qint8"),
    ("W4A16+head4", "qint4", None, "qint4"),
    ("W4A8", "qint4", "qint8", None),
    ("W4A8+head8", "qint4", "qint8", "qint8"),
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM

    sys.path.insert(0, "bench")
    from generation.latency import decode_latency
    from generation.perplexity import perplexity, synthetic_tokens

    # Throwaway first compile: the axon queue stall lands on a process's
    # first compile regardless of program.
    jax.jit(lambda x: x + 1)(jnp.zeros((8, 8))).block_until_ready()
    log(f"backend: {jax.default_backend()}")

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LlamaConfig(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                          num_hidden_layers=16, num_attention_heads=32,
                          num_key_value_heads=8, max_position_embeddings=2048,
                          dtype=jnp.bfloat16)
        prompt, new_tokens, n_tokens, window = 512, 128, 16384, 512
    else:
        cfg = LlamaConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, max_position_embeddings=1024,
                          dtype=jnp.float32)
        prompt, new_tokens, n_tokens, window = 64, 32, 4096, 256

    tokens = synthetic_tokens(cfg.vocab_size, n_tokens)
    results = {}
    for name, wbody, acts, whead in CONFIGS:
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        if wbody is not None:
            qt.quantize(model, weights=wbody, activations=acts, exclude="lm_head")
            if whead is not None:
                qt.quantize(model, weights=whead, include="lm_head")
            if acts is not None:
                ids = np.stack([tokens[i * 128 : (i + 1) * 128] for i in range(4)])
                with qt.Calibration(model):
                    model(jnp.asarray(ids.astype(np.int32)))
            qt.freeze(model)
        t0 = time.time()
        row = decode_latency(model, prompt_len=prompt, new_tokens=new_tokens)
        row["ppl"] = perplexity(model, tokens, window=window, context=window // 2)
        row["wall_s"] = round(time.time() - t0, 1)
        results[name] = row
        log(f"{name:12s} " + " ".join(f"{k}={v:.5g}" for k, v in row.items()))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
