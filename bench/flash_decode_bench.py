"""Flash-decode kernel validation + benchmark on the real TPU.

For each config (batch, ctx, kv cache dtype): check one-step decode logits
with the kernel ON match the XLA einsum path, then time a 32-token scan
decode with the kernel OFF vs ON. Run serially (single TPU process rule).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def log(msg):
    import sys

    print(msg, file=sys.stderr, flush=True)


def sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn
    from quanto_tpu.ops import config as ops_config

    p = argparse.ArgumentParser()
    p.add_argument("--new-tokens", type=int, default=32)
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

    results = {}
    for batch, ctx, kv_quant in [
        (8, 2048, None),
        (8, 2048, "qint8"),
        (1, 640, None),
    ]:
        tag = f"B{batch}/ctx{ctx}/{kv_quant or 'bf16'}"
        pos0 = ctx - args.new_tokens - 1
        tok = jnp.zeros((batch, 1), jnp.int32)

        # one-step logits parity (einsum vs kernel). NOTE: the backend flag
        # is read at trace time, so each setting needs a freshly built
        # jitted fn (jit caches by shape, not by the global flag).
        cache = init_kv_cache(config, batch, ctx, kv_quant=kv_quant)
        ops_config.set_backend(flash_decode=False)
        ref, _ = make_prefill_fn(graphdef)(state, tok, cache, pos0)
        sync(ref)
        ops_config.set_backend(flash_decode=True)
        t0 = time.time()
        out, _ = make_prefill_fn(graphdef)(state, tok, cache, pos0)
        sync(out)
        log(f"{tag}: kernel one-step compile+run {time.time()-t0:.1f}s")
        r = np.asarray(ref[:, -1].astype(jnp.float32))
        o = np.asarray(out[:, -1].astype(jnp.float32))
        cos = float(
            (r * o).sum() / (np.linalg.norm(r) * np.linalg.norm(o) + 1e-9)
        )
        maxdiff = float(np.max(np.abs(r - o)))
        log(f"{tag}: logits cos={cos:.6f} maxdiff={maxdiff:.4f}")
        assert cos > 0.999, f"{tag}: kernel logits mismatch (cos={cos})"

        # timing
        times = {}
        from quanto_tpu.ops import attention as attn_mod

        for flag, name in [(False, "einsum"), (True, "kernel_v1"), (True, "kernel_v2")]:
            attn_mod._VARIANT = name.split("_")[1] if flag else "auto"
            ops_config.set_backend(flash_decode=flag)
            decode = make_decode_fn(graphdef, args.new_tokens)
            cache = init_kv_cache(config, batch, ctx, kv_quant=kv_quant)
            toks, _ = decode(state, tok, cache, pos0)
            sync(toks)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                toks, _ = decode(state, tok, cache, pos0)
                sync(toks)
                best = min(best, time.time() - t0)
            ms = best * 1e3 / args.new_tokens
            tps = batch * args.new_tokens / best
            times[name] = ms
            log(f"{tag} [{name}]: {ms:.2f} ms/step, {tps:.0f} tok/s")
        results[tag] = times
        attn_mod._VARIANT = "auto"
        ops_config.set_backend()

    log("== summary ==")
    for tag, t in results.items():
        log(
            f"{tag}: einsum {t['einsum']:.2f} ms -> v1 {t['kernel_v1']:.2f} ms "
            f"({t['einsum']/t['kernel_v1']:.2f}x) -> v2 {t['kernel_v2']:.2f} ms "
            f"({t['einsum']/t['kernel_v2']:.2f}x)"
        )


if __name__ == "__main__":
    main()
