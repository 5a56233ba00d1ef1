"""Same-session interleaved A/B: fp8 weight dequant via XLA convert vs the
integer bit-trick (`ops/qbytes_mm.fp8_e4m3_to_float_bittrick`), at the full
1B-model decode level, with int8 as the reference point.

Context: fp8 decode trails int8 by ~13% in the same program structure
(bench/fp8_vs_int8_ab_bench.py: 1.859 vs 1.612 ms/tok) — the difference is
the per-element f8->f32 convert inside XLA's broadcast-multiply-reduce
fusions. The bit-trick replaces it with ~8 integer/select VPU ops.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.serve import make_decode_fn
from importlib import import_module

qbm = import_module("quanto_tpu.ops.qbytes_mm")  # package attr shadows the submodule


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    config = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=2048, dtype=jnp.bfloat16,
    )
    prompt_len, new_tokens, batch = 512, 128, 1
    cache_len = prompt_len + new_tokens

    def sync(x):
        return int(jax.device_get(jnp.sum(x)))

    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qfloat8", exclude="lm_head")
    qt.freeze(model)
    graphdef, state = nnx.split(model)
    cache = init_kv_cache(config, batch, cache_len, config.dtype)
    first = jnp.zeros((batch, 1), jnp.int32)

    int8_model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(int8_model, weights="qint8", exclude="lm_head")
    qt.freeze(int8_model)
    int8_graphdef, int8_state = nnx.split(int8_model)

    runs = {}
    for mode in ("convert", "bittrick"):
        qbm.FP8_DECODE = mode
        decode = make_decode_fn(graphdef, new_tokens)  # fresh trace per mode
        t0 = time.time()
        toks, _ = decode(state, first, cache, prompt_len)
        sync(toks)
        print(f"fp8/{mode}: warmup+compile {time.time()-t0:.1f}s", flush=True)
        runs[f"fp8/{mode}"] = (decode, state)
    qbm.FP8_DECODE = "convert"
    runs["int8"] = (make_decode_fn(int8_graphdef, new_tokens), int8_state)
    toks, _ = runs["int8"][0](int8_state, first, cache, prompt_len)
    sync(toks)

    times = {t: float("inf") for t in runs}
    for _ in range(5):
        for tag, (decode, st) in runs.items():
            t0 = time.time()
            toks, _ = decode(st, first, cache, prompt_len)
            sync(toks)
            times[tag] = min(times[tag], time.time() - t0)
    for tag, t in times.items():
        print(f"{tag}: {batch*new_tokens/t:.1f} tok/s ({t*1e3/new_tokens:.3f} ms/tok)")


if __name__ == "__main__":
    main()
