"""8B-config prefill throughput (tokens/s) across quant configs.

Decode is covered by `bench.py --model 8b`; this measures the OTHER serving
phase at the north-star scale: one 2048-token prompt through the 32-layer
8B-width model (the M/N/K-tiled prefill kernel route for int4). Quantized
models built on host (bf16 8B exceeds HBM), bf16 reference depth-fit from
8/16 layers, same session."""

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
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma list of quant configs to run (int8,w8a8,int4,w4a8); "
                   "default all. The bf16 depth-fit always runs.")
    p.add_argument("--bf16-softmax", action="store_true",
                   help="also measure each selected config with the bf16 "
                   "attention softmax chain (halves the [T,S] logits traffic)")
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_prefill_fn

    T = 2048

    def config_8b(layers):
        return LlamaConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=layers, num_attention_heads=32,
            num_key_value_heads=8, max_position_embeddings=4096,
            rope_theta=500000.0, dtype=jnp.bfloat16,
        )

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128256, (1, T)), jnp.int32)

    from quanto_tpu.ops import config as _cfg

    def measure(model, cfg, tag, flash=False, **backend):
        graphdef, state = nnx.split(model)
        prefill = make_prefill_fn(graphdef)
        cache = init_kv_cache(cfg, 1, T + 8, cfg.dtype)
        _cfg.set_backend(flash_prefill=flash, **backend)
        try:
            tag = tag + ("+flash" if flash else "")
            t0 = time.time()
            logits, _ = prefill(state, ids, cache, 0)
            float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
            log(f"{tag}: compile+run {time.time()-t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                logits, _ = prefill(state, ids, cache, 0)
                float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
                best = min(best, time.time() - t0)
        finally:
            _cfg.set_backend()
        tps = T / best
        log(f"{tag}: {best*1e3:.0f} ms for {T} tokens = {tps:.0f} tok/s prefill")
        return best

    # bf16 depth fit, with and without the fused causal prefill attention
    m8 = LlamaForCausalLM(config_8b(8), rngs=nnx.Rngs(0))
    m16 = LlamaForCausalLM(config_8b(16), rngs=nnx.Rngs(0))
    t8 = measure(m8, config_8b(8), "bf16-8L")
    t16 = measure(m16, config_8b(16), "bf16-16L")
    t32 = t8 + (t16 - t8) * (32 - 8) / (16 - 8)
    log(f"bf16-32L (depth-fit): {t32*1e3:.0f} ms = {T/t32:.0f} tok/s prefill")
    t8f = measure(m8, config_8b(8), "bf16-8L", flash=True)
    t16f = measure(m16, config_8b(16), "bf16-16L", flash=True)
    t32f = t8f + (t16f - t8f) * (32 - 8) / (16 - 8)
    log(f"bf16-32L+flash (depth-fit): {t32f*1e3:.0f} ms = {T/t32f:.0f} tok/s prefill")
    del m8, m16

    from quanto_tpu.ops import config as ops_config

    cfg = config_8b(32)
    only = set(args.only.split(",")) if args.only else None
    for tag, kw in [("int8", dict(weights="qint8", exclude="lm_head")),
                    ("w8a8", dict(weights="qint8", activations="qint8", exclude="lm_head")),
                    ("int4", dict(weights="qint4", exclude="lm_head")),
                    ("w4a8", dict(weights="qint4", activations="qint8", exclude="lm_head"))]:
        if only is not None and tag not in only:
            continue
        log(f"building 8B {tag} on host...")
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
            qt.quantize(model, **kw)
            # A8 configs run with the DEFAULT unit activation scales (no
            # calibration): decode speed is content-blind and real
            # deployments calibrate.
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
        t = measure(model, cfg, tag)
        log(f"{tag}: {t32/t:.2f}x of bf16 depth-fit")
        t = measure(model, cfg, tag, flash=True)
        log(f"{tag}+flash: {t32f/t:.2f}x of bf16+flash depth-fit")
        if tag == "w4a8":
            # same-session A/B of the requant-dot route (opt-in since round
            # 4) vs the exact K-chunked prefill kernel, which is the default
            # measured above (ops/config.use_w4a8_requant_dot)
            t = measure(model, cfg, tag + "+requant-dot", w4a8_requant_dot=True)
            log(f"{tag}+requant-dot: {t32/t:.2f}x of bf16 depth-fit")
        if args.bf16_softmax:
            t = measure(model, cfg, tag + "+bf16sm", bf16_softmax=True)
            log(f"{tag}+bf16sm: {t32/t:.2f}x of bf16 depth-fit")
        del model


if __name__ == "__main__":
    main()
