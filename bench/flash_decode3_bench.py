"""v3 flash-decode sweep: model-level decode vs einsum, varying bb x sb.

Same protocol as bench/flash_decode_bench.py (1B llama int8 weights, scan
decode, same session). Run on the real TPU."""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.ops import attention as attn_mod

    p = argparse.ArgumentParser()
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ctx", type=int, default=2048)
    args = p.parse_args()

    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=4096, dtype=jnp.bfloat16,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    graphdef, state = nnx.split(model)

    pos0 = args.ctx - args.new_tokens - 1
    tok = jnp.zeros((args.batch, 1), jnp.int32)

    def measure(tag, kv_quant):
        decode = make_decode_fn(graphdef, args.new_tokens)
        cache = init_kv_cache(config, args.batch, args.ctx, kv_quant=kv_quant)
        toks, _ = decode(state, tok, cache, pos0)
        sync(toks)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            toks, _ = decode(state, tok, cache, pos0)
            sync(toks)
            best = min(best, time.time() - t0)
        ms = best * 1e3 / args.new_tokens
        log(f"{tag}: {ms:.2f} ms/step")
        return ms

    for kv_quant in [None, "qint8"]:
        kvtag = kv_quant or "bf16"
        ops_config.set_backend(flash_decode=False)
        base = measure(f"einsum/{kvtag}", kv_quant)
        ops_config.set_backend(flash_decode=True)
        rows = {}
        itemsize = 1 if kv_quant else 2
        for bb in (1, 2, 4, 8):
            if args.batch % bb:
                continue
            for sb in (512, 1024, 2048, 4096, 8192):
                if args.ctx % sb:
                    continue
                # v3's own VMEM gate (mirror it to skip predictable fallbacks)
                if 4 * bb * sb * 512 * itemsize > 48 * 1024 * 1024:
                    continue
                attn_mod._VARIANT = "v3"
                attn_mod._V3_BB = bb
                attn_mod._V3_SB = sb
                ms = measure(f"v3 bb={bb} sb={sb}/{kvtag}", kv_quant)
                rows[(bb, sb)] = ms
        best = min(rows, key=rows.get)
        log(
            f"== {kvtag}: einsum {base:.2f} ms; best v3 bb={best[0]} sb={best[1]} "
            f"{rows[best]:.2f} ms ({base/rows[best]:.2f}x) =="
        )
        attn_mod._VARIANT = "auto"
        ops_config.set_backend()


if __name__ == "__main__":
    main()
