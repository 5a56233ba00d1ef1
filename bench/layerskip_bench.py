"""Layer-skip self-speculative economics on the real TPU.

With random weights the measured acceptance is meaningless, so this bench
measures what hardware determines — the draft/verify step costs — and
reports the BREAK-EVEN acceptance curve: speculative decoding with a
j-layer self-draft and window k wins when

    tokens/round = 1 + E[accepted] > (k * c_draft + c_verify) / c_target

where E[accepted] = a(1-a^k)/(1-a) for per-token acceptance a.
Reported: c_draft/c_target measured, the minimum acceptance a* where the
speedup crosses 1.0, and the speedup at a in {0.6, 0.7, 0.8} (typical
published layer-skip acceptance on real checkpoints)."""

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
    from quanto_tpu.models.speculative import layerskip_draft

    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    target = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(target, weights="qint4")
    qt.freeze(target)

    def step_ms(model, cfg, tag, m=1):
        graphdef, state = nnx.split(model)
        decode = make_decode_fn(graphdef, 64)
        cache = init_kv_cache(cfg, 1, 640, cfg.dtype)
        tok = jnp.zeros((1, m), jnp.int32)[:, :1]
        t0 = time.time()
        toks, _ = decode(state, tok, cache, 512)
        float(jax.device_get(jnp.sum(toks)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            toks, _ = decode(state, tok, cache, 512)
            float(jax.device_get(jnp.sum(toks)))
            best = min(best, time.time() - t0)
        ms = best * 1e3 / 64
        log(f"{tag}: {ms:.3f} ms/tok")
        return ms

    c_t = step_ms(target, config, "target int4 16L")
    for j in (2, 4, 8):
        draft = layerskip_draft(target, j)
        c_d = step_ms(draft, draft.config, f"draft {j}L (shared weights)")
        ratio = c_d / c_t
        for k in (3, 4, 6):
            cost = k * ratio + 1.0  # verify [B, k+1] forward ~ 1 decode step
            astar = None
            for a in np.linspace(0.01, 0.99, 99):
                e = a * (1 - a**k) / (1 - a)
                if (1 + e) / cost >= 1.0:
                    astar = a
                    break
            sp = {
                a: (1 + a * (1 - a**k) / (1 - a)) / cost for a in (0.6, 0.7, 0.8)
            }
            log(
                f"  j={j} k={k}: c_d/c_t={ratio:.3f} break-even a*="
                f"{astar:.2f}; speedup a=0.6:{sp[0.6]:.2f}x a=0.7:{sp[0.7]:.2f}x "
                f"a=0.8:{sp[0.8]:.2f}x"
            )


if __name__ == "__main__":
    main()
