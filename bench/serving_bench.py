"""Continuous-batching engine throughput on the real chip.

Measures the 1B llama int4 engine draining a mixed-length batch:
- stepwise decode (one device call + host sync per token), vs
- burst decode (`run_to_completion(burst=k)`: k scanned steps per call).

The per-step host round-trip is pure overhead the scan amortizes; the
reference has no serving layer to compare against (single-request eager
generation only), so the baseline is our own stepwise mode.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serving import BatchedEngine


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["1b", "8b"], default="1b",
                   help="8b = Llama-3.1-8B-shaped north-star serving slice "
                   "(int4+head4 weights, built on host)")
    p.add_argument("--kv", default="bf16",
                   choices=["bf16", "qint8", "qint4", "k8v4", "qint4a", "k8v4a"],
                   help="KV cache spec for the engine "
                   "(tensor/kv_cache.parse_kv_spec)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--burst", type=int, default=16)
    p.add_argument("--stepwise", action="store_true", help="also run the stepwise baseline")
    p.add_argument(
        "--batched-chunk", type=int, default=128,
        help="prefill chunk for the batched-prefill run (B*chunk > 512 engages "
        "the tiled prefill kernel; serial runs keep chunk=64)",
    )
    p.add_argument("--bf16-softmax", action="store_true",
                   help="enable the bf16 attention softmax chain for the "
                   "whole run (the recommended long-context serving config "
                   "pairs it with --kv qint4)")
    p.add_argument("--long-ctx", action="store_true",
                   help="8B long-context serving slice: prompts 3.3-4k "
                   "tokens, max_len 4352 (the north-star serving regime)")
    p.add_argument("--stream", action="store_true",
                   help="closed-loop streaming arm: keep `--batch` requests "
                   "in flight, a new one arrives whenever a slot frees — "
                   "admission via blocking add() (baseline) vs enqueue() "
                   "(mixed chunked-prefill/decode interleaving)")
    p.add_argument("--stream-requests", type=int, default=16,
                   help="total requests served in the --stream arm")
    p.add_argument("--moe", action="store_true",
                   help="13.6B-total Mixtral-shaped MoE through the "
                   "stacked-expert kernel dispatch instead of the dense "
                   "llama — run with --batch 1/2 for the "
                   "selective-streaming decode regime")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"
    if args.moe:
        return main_moe(args, on_tpu)
    if on_tpu and args.model == "8b":
        config = LlamaConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=8192, rope_theta=500000.0, dtype=jnp.bfloat16,
        )
        if args.long_ctx:
            prompt_lens = [4096, 3328, 3840, 3584, 4096, 3456, 3200, 3968][: args.batch]
            max_len = 4352
        else:
            prompt_lens = [512, 384, 448, 256, 512, 320, 192, 448][: args.batch]
            max_len = 768
    elif on_tpu:
        config = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=2048, dtype=jnp.bfloat16,
        )
        prompt_lens = [512, 384, 448, 256, 512, 320, 192, 448][: args.batch]
        max_len = 768
    else:
        config = LlamaConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, dtype=jnp.float32,
        )
        prompt_lens = [16, 24, 8, 12][: args.batch]
        max_len = 64

    if args.model == "8b" and on_tpu:
        # bf16 8B exceeds the 16 GB chip: build + quantize on host (int4
        # including the head, the headline config), then transfer.
        from quanto_tpu.ops import config as ops_config

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
            qt.quantize(model, weights="qint4")
            ops_config.set_backend(pallas_qbits=True)
            try:
                qt.freeze(model)
            finally:
                ops_config.set_backend()
        dev = jax.devices()[0]
        for _path, node in nnx.iter_graph(model):
            if isinstance(node, nnx.Variable):
                v = node.get_value()
                if v is not None:
                    node.set_value(jax.device_put(v, dev))
    else:
        model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
        qt.quantize(model, weights="qint4", exclude="lm_head")
        qt.freeze(model)

    kv_quant = None if args.kv == "bf16" else args.kv
    if args.bf16_softmax:
        from quanto_tpu.ops import config as _ops_config

        _ops_config.set_backend(bf16_softmax=True)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, config.vocab_size, size=L).tolist() for L in prompt_lens]

    def run(burst, batch_prefill=False, chunk=64):
        engine = BatchedEngine(
            model, max_batch=len(prompts), max_len=max_len, prefill_chunk=chunk,
            kv_quant=kv_quant,
        )

        def admit():
            if batch_prefill:
                return engine.add_batch(prompts, max_new_tokens=args.new_tokens)
            return [engine.add(p, max_new_tokens=args.new_tokens) for p in prompts]

        t0 = time.time()
        rids = admit()
        prefill_t = time.time() - t0
        # warm the decode program(s)
        engine.run_to_completion(burst=burst)
        warm_tokens = sum(len(engine.result(r)) for r in rids)
        # timed drain on fresh requests
        t0 = time.time()
        rids = admit()
        mid = time.time()
        engine.run_to_completion(burst=burst)
        decode_t = time.time() - mid
        total_t = time.time() - t0
        n_tokens = sum(len(engine.result(r)) for r in rids)
        tag = (f"batched-prefill(C={chunk}) " if batch_prefill else "") + (
            f"burst={burst}" if burst else "stepwise"
        )
        print(
            f"{tag:28s}: {n_tokens} tokens, decode {decode_t:.2f}s "
            f"({n_tokens/decode_t:.1f} tok/s), warm prefill {mid-t0:.2f}s, "
            f"e2e {n_tokens/total_t:.1f} tok/s, first-run prefill {prefill_t:.2f}s",
            flush=True,
        )
        return n_tokens / decode_t, n_tokens / total_t

    def run_stream(mixed: bool, chunk: int):
        """Closed-loop streaming: `--batch` requests in flight; when one
        finishes, the next arrives immediately. Baseline admission is the
        blocking add() (every arrival's prefill stalls ALL decode streams);
        mixed admission is enqueue() (prefill chunks ride the decode steps).
        Throughput = completed decode tokens / wall time."""
        engine = BatchedEngine(
            model, max_batch=args.batch, max_len=max_len, prefill_chunk=chunk,
            kv_quant=kv_quant,
        )
        admit = engine.enqueue if mixed else engine.add
        total = args.stream_requests
        pending = [prompts[i % len(prompts)] for i in range(total)]
        # Warm all programs (prefill chunks, mixed step, decode bursts).
        for p_ in prompts[: min(2, len(pending))]:
            admit(p_, max_new_tokens=8)
        engine.run_to_completion(burst=args.burst)
        rids = []
        t0 = time.time()
        while len(rids) < total or engine._has_work():
            while len(rids) < total and engine.can_add():
                rids.append(admit(pending[len(rids)], max_new_tokens=args.new_tokens))
            engine.serve_step(args.burst)
        dt = time.time() - t0
        n_tokens = sum(len(engine.result(r)) for r in rids)
        tag = "stream mixed(enqueue)" if mixed else "stream blocking(add)"
        print(
            f"{tag:28s}: {total} reqs, {n_tokens} tokens in {dt:.2f}s "
            f"({n_tokens/dt:.1f} tok/s)",
            flush=True,
        )
        return n_tokens / dt

    if args.stream:
        base = run_stream(mixed=False, chunk=args.batched_chunk)
        mixed = run_stream(mixed=True, chunk=args.batched_chunk)
        print(f"mixed-interleaving streaming speedup: {mixed/base:.2f}x")
        return

    if args.stepwise:
        step_tps, _ = run(None)
    burst_tps, e2e_serial = run(args.burst)
    _, e2e_batched = run(args.burst, batch_prefill=True, chunk=args.batched_chunk)
    if args.stepwise:
        print(f"burst speedup over stepwise decode: {burst_tps/step_tps:.2f}x")
    print(f"batched-prefill e2e speedup over serial prefill: {e2e_batched/e2e_serial:.2f}x")


def main_moe(args, on_tpu):
    """MoE serving: the 13.6B-total Mixtral shape (bench/moe_bench.py) drains
    through the continuous-batching engine with stacked-expert kernel
    dispatch. At --batch 1/2 each decode step streams only the routed
    experts (RESULTS.md round-4 MoE table: 2.31x/1.62x over dense-mask)."""
    from quanto_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.parallel import convert_moe_to_stacked

    if on_tpu:
        config = MixtralConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=4096, num_local_experts=8,
            num_experts_per_tok=2, dtype=jnp.bfloat16,
        )
        prompt_lens = [512, 384, 448, 256, 512, 320, 192, 448][: args.batch]
        max_len = 768
    else:
        config = MixtralConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, num_local_experts=4,
            num_experts_per_tok=2, dtype=jnp.float32,
        )
        prompt_lens = [16, 24][: args.batch]
        max_len = 64

    print(f"building MoE ({'13.6B' if on_tpu else 'tiny'}) on host...", flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = MixtralForCausalLM(config, rngs=nnx.Rngs(0))
        qt.quantize(model, weights="qint4", exclude="lm_head")
        # Force the TPU kernel layout even on CPU hosts (interpret-mode
        # kernels): the stacked dispatch requires WeightQBitsTpuArray.
        ops_config.set_backend(pallas_qbits=True)
        try:
            qt.freeze(model)
        finally:
            ops_config.set_backend()
        n = convert_moe_to_stacked(model, capacity_factor=2.0)
        print(f"converted {n} blocks to stacked-kernel dispatch", flush=True)
    dev = jax.devices()[0]
    for _path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Variable):
            v = node.get_value()
            if v is not None:
                node.set_value(jax.device_put(v, dev))

    kv_quant = None if args.kv == "bf16" else args.kv
    if args.bf16_softmax:
        ops_config.set_backend(bf16_softmax=True)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, config.vocab_size, size=L).tolist() for L in prompt_lens]
    engine = BatchedEngine(
        model, max_batch=len(prompts), max_len=max_len, kv_quant=kv_quant
    )
    rids = [engine.add(p, max_new_tokens=args.new_tokens) for p in prompts]
    engine.run_to_completion(burst=args.burst)  # warm
    rids = [engine.add(p, max_new_tokens=args.new_tokens) for p in prompts]
    t0 = time.time()
    engine.run_to_completion(burst=args.burst)
    dt = time.time() - t0
    n_tokens = sum(len(engine.result(r)) for r in rids)
    print(
        f"moe serving B={len(prompts)} kv={args.kv}: {n_tokens} tokens, "
        f"decode {dt:.2f}s ({n_tokens/dt:.1f} tok/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
