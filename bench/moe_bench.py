"""MoE performance at scale (VERDICT round-2 next #4).

Mixtral-shaped sparse model sized for the 16 GB chip at int4 (E=8, top-2,
hidden 4096, intermediate 8192, 16 layers ~= 13.6B total / ~4.1B active
params) vs a dense model of equal ACTIVE params (intermediate 16384 = top_k x
8192, same attention). Measures:

- decode tok/s at B=8 (weights-streaming regime: the sparse model must
  stream ~E/top_k x the MLP bytes of the dense-active model per step, so
  dense-mask and gathered dispatch should tie here);
- prefill tok/s at B=1, T=2048 (MXU regime: dense-mask spends E x the useful
  MLP FLOPs; the gathered capacity dispatch cuts it to ~cf*top_k/E).

Variants (one per --variant, run sequentially by the default "all"):
  dense-active : dense model, intermediate = top_k * inter
  moe-dense    : dense-mask MoE block (every expert on all tokens)
  moe-gathered : GatheredSparseMoeBlock, capacity_factor=2.0
"""

from __future__ import annotations

import argparse
import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def log(msg):
    print(msg, file=sys.stderr, flush=True)


HIDDEN, INTER, LAYERS, EXPERTS, TOPK = 4096, 8192, 16, 8, 2


def build(variant):
    import quanto_tpu as qt
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM
    from quanto_tpu.ops import config as ops_config

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if variant == "dense-active":
            cfg = LlamaConfig(
                vocab_size=32000, hidden_size=HIDDEN,
                intermediate_size=TOPK * INTER, num_hidden_layers=LAYERS,
                num_attention_heads=32, num_key_value_heads=8,
                max_position_embeddings=4096, dtype=jnp.bfloat16,
            )
            model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        else:
            cfg = MixtralConfig(
                vocab_size=32000, hidden_size=HIDDEN, intermediate_size=INTER,
                num_hidden_layers=LAYERS, num_attention_heads=32,
                num_key_value_heads=8, max_position_embeddings=4096,
                num_local_experts=EXPERTS, num_experts_per_tok=TOPK,
                dtype=jnp.bfloat16,
            )
            model = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))
        qt.quantize(model, weights="qint4", exclude="lm_head")
        ops_config.set_backend(pallas_qbits=True)
        try:
            qt.freeze(model)
        finally:
            ops_config.set_backend()
        if variant == "moe-gathered":
            from quanto_tpu.parallel import convert_moe_to_gathered

            n = convert_moe_to_gathered(model, capacity_factor=2.0)
            log(f"converted {n} blocks to gathered dispatch")
        elif variant == "moe-stacked":
            from quanto_tpu.parallel import convert_moe_to_stacked

            n = convert_moe_to_stacked(model, capacity_factor=2.0)
            log(f"converted {n} blocks to stacked-kernel dispatch")
    dev = jax.devices()[0]
    for _p, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Variable):
            v = node.get_value()
            if v is not None:
                node.set_value(jax.device_put(v, dev))
    return model, cfg


def measure(variant):
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn

    log(f"building {variant} on host...")
    t0 = time.time()
    model, cfg = build(variant)
    log(f"{variant}: built+transferred in {time.time()-t0:.0f}s")
    graphdef, state = nnx.split(model)

    # decode: B sweep, ctx 512+, 32 scanned steps. VERDICT round-3 #4:
    # B=1-2 is the regime where per-step expert subsetting matters (a step
    # touches ~S*top_k of E experts); B=8 is the all-experts streaming tie.
    new = 32
    decode = make_decode_fn(graphdef, new)
    for B in (1, 2, 4, 8):
        cache = init_kv_cache(cfg, B, 640, kv_quant="qint8")
        tok = jnp.zeros((B, 1), jnp.int32)
        toks, _ = decode(state, tok, cache, 512)
        float(jax.device_get(jnp.sum(toks)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            toks, _ = decode(state, tok, cache, 512)
            float(jax.device_get(jnp.sum(toks)))
            best = min(best, time.time() - t0)
        dec_tps = B * new / best
        log(f"{variant}: decode {best*1e3/new:.2f} ms/step, {dec_tps:.0f} tok/s (B={B})")
        del cache

    # prefill: B=1, T=2048
    T = 2048
    prefill = make_prefill_fn(graphdef)
    cache = init_kv_cache(cfg, 1, T + 8, kv_quant="qint8")
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 32000, (1, T)), jnp.int32)
    logits, _ = prefill(state, ids, cache, 0)
    float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        logits, _ = prefill(state, ids, cache, 0)
        float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
        best = min(best, time.time() - t0)
    log(f"{variant}: prefill {best*1e3:.0f} ms / {T} tokens = {T/best:.0f} tok/s")
    del model, state, cache
    gc.collect()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="all",
                   choices=["all", "dense-active", "moe-dense", "moe-gathered",
                            "moe-stacked"])
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = (
        ["dense-active", "moe-dense", "moe-gathered", "moe-stacked"]
        if args.variant == "all"
        else [args.variant]
    )
    for v in variants:
        measure(v)


if __name__ == "__main__":
    main()
