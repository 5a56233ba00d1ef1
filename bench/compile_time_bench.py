"""Compile-time: scan-over-layers (stacked) vs unrolled prefill.

The claim under test (models/scan.py): compiling ONE layer body + lax.scan
is ~L× cheaper than compiling L unrolled copies. Methodology pitfalls this
bench works around:

- The axon remote-compile service has a PERSISTENT cross-session cache
  (axiom_compilation_cache) keyed on program bytes — any shape compiled in
  a previous session returns in seconds. Use --seq values never compiled
  before (check RESULTS.md history) so both variants are cold.
- The service's queue adds high-variance latency (observed ~960 s stalls on
  a process's first compile). Run BOTH orders (--order stacked-first /
  unrolled-first) in separate invocations and compare the min per variant.

Reports wall-clock time-to-first-logits (compile + one execution) per
variant per sequence length.
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


def main():
    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_prefill_fn, make_stacked_fns

    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, nargs="+", default=[448])
    p.add_argument(
        "--order", default="stacked-first", choices=["stacked-first", "unrolled-first"]
    )
    p.add_argument("--layers", type=int, default=16)
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    config = LlamaConfig(
        vocab_size=32000 if on_tpu else 256,
        hidden_size=2048 if on_tpu else 128,
        intermediate_size=5632 if on_tpu else 256,
        num_hidden_layers=args.layers if on_tpu else 2,
        num_attention_heads=32 if on_tpu else 4,
        num_key_value_heads=8 if on_tpu else 2,
        max_position_embeddings=4096,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))

    graphdef, state = nnx.split(model)
    prefill = make_prefill_fn(graphdef)
    runner, stacked_prefill, _ = make_stacked_fns(model, 1)

    def sync(x):
        return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

    def run_unrolled(T):
        ids = jnp.asarray(np.random.RandomState(0).randint(0, config.vocab_size, (1, T)))
        cache = init_kv_cache(config, 1, T + 8)
        t0 = time.time()
        logits, _ = prefill(state, ids, cache, 0)
        sync(logits)
        return time.time() - t0

    def run_stacked(T):
        ids = jnp.asarray(np.random.RandomState(0).randint(0, config.vocab_size, (1, T)))
        cache = runner.init_kv_cache(1, T + 8)
        t0 = time.time()
        logits, _ = stacked_prefill(runner.state, ids, cache, 0)
        sync(logits)
        return time.time() - t0

    for T in args.seq:
        if args.order == "stacked-first":
            s = run_stacked(T)
            log(f"T={T} stacked : {s:8.1f} s (compile+run, cold if T is fresh)")
            u = run_unrolled(T)
            log(f"T={T} unrolled: {u:8.1f} s (compile+run, cold if T is fresh)")
        else:
            u = run_unrolled(T)
            log(f"T={T} unrolled: {u:8.1f} s (compile+run, cold if T is fresh)")
            s = run_stacked(T)
            log(f"T={T} stacked : {s:8.1f} s (compile+run, cold if T is fresh)")
        log(f"T={T} ratio unrolled/stacked = {u/s:.2f}x")


if __name__ == "__main__":
    main()
