"""GPT-OSS fused-expert stacked composition on the real chip.

The round-4 item left pending by the TPU-tunnel outage: drive
`convert_gpt_oss_moe_to_stacked` (fused bf16 expert Params -> stacked
sub-byte kernel layout with the 2880->3072 zero-pad envelope) on hardware.

Two arms, one session:
- fidelity: 2-layer model at the REAL released dims (hidden 2880,
  intermediate 2880, 32 experts top-4, sinks + alternating sliding window):
  bf16 reference logits vs the stacked-int4 conversion, cosine on-chip.
- perf: 16-layer 20b-shaped model (int4 everywhere incl. fused experts,
  ~7 GiB on-chip): decode B in {1,2,4} + prefill T=2048, selective
  streaming vs forced all-experts route (moe_mm._SEL_MAX=0) A/B.

Reference protocol analogue: per-token generation latency,
/root/reference/bench/generation/metrics/latency.py.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _to_device(m):
    dev = jax.devices()[0]
    for _p, node in nnx.iter_graph(m):
        if isinstance(node, nnx.Variable):
            v = node.get_value()
            if v is not None:
                node.set_value(jax.device_put(v, dev))


def fidelity_arm(on_tpu):
    import quanto_tpu as qt  # noqa: F401
    from quanto_tpu.models import GptOssConfig, GptOssForCausalLM
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.parallel import convert_gpt_oss_moe_to_stacked

    if on_tpu:
        cfg = GptOssConfig(
            vocab_size=1024, hidden_size=2880, intermediate_size=2880,
            num_hidden_layers=2, num_attention_heads=64, num_key_value_heads=8,
            head_dim=64, num_local_experts=32, num_experts_per_tok=4,
            max_position_embeddings=512, dtype=jnp.bfloat16,
        )
        T = 64
    else:
        cfg = GptOssConfig(
            vocab_size=128, hidden_size=512, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, num_local_experts=8, num_experts_per_tok=2,
            sliding_window=8, max_position_embeddings=64, dtype=jnp.float32,
        )
        T = 8

    log(f"[fidelity] building {cfg.num_hidden_layers}-layer H={cfg.hidden_size} "
        f"E={cfg.num_local_experts} model...")
    model = GptOssForCausalLM(cfg, rngs=nnx.Rngs(0))
    if on_tpu:
        _to_device(model)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (1, T)), jnp.int32
    )
    ref, _ = model(ids)
    ref = jax.device_get(ref.astype(jnp.float32))

    from quanto_tpu.models.serve import make_prefill_fn

    if not on_tpu:  # CPU: force the interpreted Pallas kernel path
        ops_config.set_backend(pallas_qbits=True)
    try:
        # capacity_factor=None: exact prefill dispatch (no token dropping),
        # so the kernel-vs-oracle check below is a pure numerics comparison
        # (the XLA dense fallback has no capacity semantics).
        n = convert_gpt_oss_moe_to_stacked(
            model, weights="qint4", capacity_factor=None
        )
        log(f"[fidelity] converted {n} fused-expert blocks to stacked int4")
        graphdef, state = nnx.split(model)
        out, _ = make_prefill_fn(graphdef)(state, ids, None, 0)
    finally:
        if not on_tpu:
            ops_config.set_backend()
    out = jax.device_get(out.astype(jnp.float32))

    def cosine(u, v):
        u, v = np.asarray(u).ravel(), np.asarray(v).ravel()
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-9))

    cos = cosine(out, ref)
    # Random-init bf16 2-layer MoE at H=2880: int4 noise alone gives ~0.95
    # (CPU interpret measures 0.9535 at identical dims/dtype; real
    # checkpoints with trained scales sit far higher — cf. the llama tables).
    log(f"[fidelity] stacked-int4 vs bf16 logits cosine = {cos:.6f}")
    assert cos > 0.93, cos

    # The sharp check: Mosaic kernel path vs the XLA dequant oracle on the
    # SAME quantized weights (quantization noise excluded) — this is what
    # would catch an interpret-green/Mosaic-red kernel.
    from quanto_tpu.parallel.moe import StackedSparseMoeBlock

    orig_mm = StackedSparseMoeBlock._mm
    StackedSparseMoeBlock._mm = lambda self, *a, **k: None  # force oracle
    try:
        oracle, _ = make_prefill_fn(graphdef)(state, ids, None, 0)
    finally:
        StackedSparseMoeBlock._mm = orig_mm
    oracle = jax.device_get(oracle.astype(jnp.float32))
    kcos = cosine(out, oracle)
    log(f"[fidelity] kernel vs XLA-dequant oracle cosine = {kcos:.6f}")
    assert kcos > 0.999, kcos

    # Cached decode path (sinks + sliding mask + selective streaming).
    from quanto_tpu.models.serve import make_decode_fn

    graphdef, state = nnx.split(model)
    decode = make_decode_fn(graphdef, 8)
    cache = model.init_kv_cache(1, T + 16, kv_quant="qint8")
    toks, _ = decode(state, ids[:, -1:], cache, T)
    assert bool(jnp.all(toks >= 0))
    log("[fidelity] cached stacked decode OK on this backend")
    return cos


def perf_arm(on_tpu, full=False):
    import quanto_tpu as qt
    from quanto_tpu.models import GptOssConfig, GptOssForCausalLM
    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.ops.pallas import moe_mm
    from quanto_tpu.parallel import convert_gpt_oss_moe_to_stacked

    if not on_tpu:
        log("[perf] skipped off-TPU")
        return

    if full:
        # The RELEASED gpt-oss-20b geometry (24 layers, 201k vocab) with
        # int4 fused experts AND an int4 lm_head (padded kernel: K=2880):
        # ~11.6 GiB on the 16 GB chip. Random weights; the drive is the
        # full-architecture compile + rate, not quality.
        cfg = GptOssConfig(dtype=jnp.bfloat16)  # released defaults
    else:
        cfg = GptOssConfig(
            vocab_size=32000, hidden_size=2880, intermediate_size=2880,
            num_hidden_layers=16, num_attention_heads=64, num_key_value_heads=8,
            head_dim=64, num_local_experts=32, num_experts_per_tok=4,
            max_position_embeddings=8192, dtype=jnp.bfloat16,
        )
    # int4 routed-expert payload (padded 2880->3072 contraction):
    eb = cfg.num_local_experts * (5760 * 3072 + 2880 * 3072) / 2
    log(f"[perf] expert bytes/layer {eb/2**20:.0f} MiB x {cfg.num_hidden_layers} "
        f"layers = {cfg.num_hidden_layers*eb/2**30:.2f} GiB int4; top-4 of 32 "
        f"-> selective streams 12.5% at B=1")

    tag = "REAL 24-layer gpt-oss-20b geometry (int4 head)" if full else "16-layer 20b-shaped model"
    log(f"[perf] building {tag} on host...")
    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = GptOssForCausalLM(cfg, rngs=nnx.Rngs(0))
        if full:
            qt.quantize(model, weights="qint4")  # incl. the 201k lm_head
        else:
            qt.quantize(model, weights="qint4", exclude="lm_head")
        ops_config.set_backend(pallas_qbits=True)
        try:
            qt.freeze(model)
            n = convert_gpt_oss_moe_to_stacked(model, weights="qint4")
        finally:
            ops_config.set_backend()
    log(f"[perf] built + quantized + stacked {n} blocks in {time.time()-t0:.0f}s")
    _to_device(model)

    graphdef, state = nnx.split(model)
    new = 32

    def measure_decode(tag):
        # Fresh jitted decode per arm: route selection (e.g. a patched
        # _SEL_MAX) binds at TRACE time, so arms must not share programs.
        decode = make_decode_fn(graphdef, new)
        for B in (1, 2, 4):
            cache = model.init_kv_cache(B, 640, kv_quant="qint8")
            tok = jnp.zeros((B, 1), jnp.int32)
            toks, _ = decode(state, tok, cache, 512)
            float(jax.device_get(jnp.sum(toks)))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                toks, _ = decode(state, tok, cache, 512)
                float(jax.device_get(jnp.sum(toks)))
                best = min(best, time.time() - t0)
            log(f"[perf] {tag}: decode {best*1e3/new:.2f} ms/step, "
                f"{B*new/best:.0f} tok/s (B={B})")

    measure_decode("selective")
    # Forced all-experts route: the dense-dispatch equivalent on identical
    # weights (the bf16 dense model does not fit the chip at this size).
    sel_max = moe_mm._SEL_MAX
    moe_mm._SEL_MAX = 0
    try:
        measure_decode("all-experts")
    finally:
        moe_mm._SEL_MAX = sel_max

    prefill = make_prefill_fn(graphdef)
    # Full geometry: T=1024 keeps the [1, T, 201088] f32 logits tensor of
    # the full-logits prefill under the 16 GB budget (the ENGINE's prefill
    # avoids it entirely via logits_indices; this arm measures the raw
    # whole-prompt program).
    T = 1024 if full else 2048
    cache = model.init_kv_cache(1, T + 8, kv_quant="qint8")
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (1, T)), jnp.int32
    )
    logits, _ = prefill(state, ids, cache, 0)
    float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        logits, _ = prefill(state, ids, cache, 0)
        float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
        best = min(best, time.time() - t0)
    log(f"[perf] prefill {best*1e3:.0f} ms / {T} tokens = {T/best:.0f} tok/s")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="perf arm at the released 24-layer 201k-vocab "
                    "geometry with an int4 lm_head (padded kernel)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend: {jax.default_backend()}")
    if not args.full:
        fidelity_arm(on_tpu)
    perf_arm(on_tpu, full=args.full)


if __name__ == "__main__":
    main()
