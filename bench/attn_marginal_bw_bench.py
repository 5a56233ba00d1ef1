"""Is the einsum decode-attention path already at the HBM roof?

Measure model-level decode at fixed batch across context lengths; the
MARGINAL step-time per cache byte is the effective cache-streaming
bandwidth, independent of the fixed weight/activation cost. Same-session
numbers only (tunnel offsets)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn

    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=8192, dtype=jnp.bfloat16,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    graphdef, state = nnx.split(model)
    B, new = 8, 32

    def sync(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

    for kv_quant in [None, "qint8"]:
        times = {}
        for ctx in (512, 2048, 4096, 8192):
            decode = make_decode_fn(graphdef, new)
            cache = init_kv_cache(config, B, ctx, kv_quant=kv_quant)
            tok = jnp.zeros((B, 1), jnp.int32)
            pos0 = ctx - new - 1
            toks, _ = decode(state, tok, cache, pos0)
            sync(toks)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                toks, _ = decode(state, tok, cache, pos0)
                sync(toks)
                best = min(best, time.time() - t0)
            times[ctx] = best * 1e3 / new
            log(f"kv={kv_quant or 'bf16'} ctx={ctx}: {times[ctx]:.3f} ms/step")
        itemsize = 1 if kv_quant else 2
        kd = config.num_key_value_heads * (config.hidden_size // config.num_attention_heads)
        for c0, c1 in [(512, 2048), (2048, 4096), (4096, 8192)]:
            extra_bytes = 2 * (c1 - c0) * kd * itemsize * B * config.num_hidden_layers
            if kv_quant:
                extra_bytes += 2 * (c1 - c0) * config.num_key_value_heads * 4 * B * config.num_hidden_layers
            dt = (times[c1] - times[c0]) * 1e-3
            log(
                f"kv={kv_quant or 'bf16'} marginal {c0}->{c1}: "
                f"{extra_bytes/1e6:.0f} MB extra/step, {dt*1e3:.3f} ms -> "
                f"{extra_bytes/dt/1e9:.0f} GB/s effective"
            )


if __name__ == "__main__":
    main()
