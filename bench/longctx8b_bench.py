"""8B long-context batched decode: int4 weights x int8 KV cache.

The serving-relevant regime the 8B headline doesn't cover: B=4, ctx 8192
(cache 0.54 GB/seq int8, 2.1 GB total + 4.5 GB weights). Reports tok/s and
the attention share via a ctx-512 same-session reference."""

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
    from quanto_tpu.ops import config as ops_config

    cfg = LlamaConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=16384, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    log("building 8B int4+head4 on host...")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        qt.quantize(model, weights="qint4")
        ops_config.set_backend(pallas_qbits=True)
        try:
            qt.freeze(model)
        finally:
            ops_config.set_backend()
    dev = jax.devices()[0]
    for _p, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Variable):
            v = node.get_value()
            if v is not None:
                node.set_value(jax.device_put(v, dev))
    graphdef, state = nnx.split(model)
    B, new = 4, 32

    def run(ctx, kv_quant, bf16_softmax=False, asym_fused=None):
        # Explicit boolean: None means "auto/env" and an inherited
        # QUANTO_TPU_BF16_SOFTMAX=1 would taint the f32 baseline arms.
        ops_config.set_backend(
            bf16_softmax=bool(bf16_softmax), asym_fused=asym_fused
        )
        try:
            decode = make_decode_fn(graphdef, new)
            cache = init_kv_cache(cfg, B, ctx, kv_quant=kv_quant)
            tok = jnp.zeros((B, 1), jnp.int32)
            pos0 = ctx - new - 1
            toks, _ = decode(state, tok, cache, pos0)
            float(jax.device_get(jnp.sum(toks)))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                toks, _ = decode(state, tok, cache, pos0)
                float(jax.device_get(jnp.sum(toks)))
                best = min(best, time.time() - t0)
        finally:
            ops_config.set_backend()
        ms = best * 1e3 / new
        sm = " bf16-softmax" if bf16_softmax else ""
        log(f"B={B} ctx={ctx} kv={kv_quant or 'bf16'}{sm}: {ms:.2f} ms/step, "
            f"{B*new/best:.0f} tok/s")
        return ms

    short = run(512, "qint8")
    for kv in (None, "qint8", "qint4"):
        long_ms = run(8192, kv)
        log(f"  attention delta vs ctx512/int8: +{long_ms - short:.2f} ms/step")
    # bf16 softmax chain arms (the residual long-ctx marginal is the f32
    # logits/softmax elementwise traffic — RESULTS.md round-3 attention).
    for kv in ("qint8", "qint4"):
        long_ms = run(8192, kv, bf16_softmax=True)
        log(f"  attention delta vs ctx512/int8: +{long_ms - short:.2f} ms/step")
    # Fidelity dials (round 4, VERDICT #5): mixed k8v4 (K int8 + V int4)
    # and asymmetric int4 (rank-1 shift corrections in attention) — the
    # speed side of the fidelity-vs-speed table (KL side:
    # tests/models/test_kv_cache.py::test_kv_cache_kl_ordering).
    for kv in ("k8v4", "qint4a"):
        long_ms = run(8192, kv, bf16_softmax=True)
        log(f"  attention delta vs ctx512/int8: +{long_ms - short:.2f} ms/step")
    # Asymmetric-epilogue fusion A/B (round 5, VERDICT #5): the fused
    # formulation (chain-dtype k-term + einsum v-correction) vs the round-4
    # f32 side-pass — the ~1.8 ms/step correction cost this targets.
    for kv in ("qint4a", "k8v4a"):
        fused_ms = run(8192, kv, bf16_softmax=True, asym_fused=True)
        unfused_ms = run(8192, kv, bf16_softmax=True, asym_fused=False)
        log(
            f"  {kv} asym-fused {fused_ms:.2f} vs side-pass {unfused_ms:.2f} "
            f"ms/step ({unfused_ms / fused_ms:.2f}x)"
        )


if __name__ == "__main__":
    main()
