"""DeepSeek-style high-expert-count MoE decode: stacked vs dense dispatch.

V3-like routing shapes (many routed experts, top-k of 6-8) are where the
selective stacked dispatch pays most: a single-stream decode step touches
top_k of E experts, so expert-weight streaming drops by ~E/top_k (vs E for
any dense dispatch). This measures a chip-sized deepseek-shaped model
(sigmoid/group router + shared expert, MLA attention, 64 routed experts,
top-6) — scaled from V3's 256/top-8 to fit 16 GB at int4.

One session: dense-mask baseline then convert_moe_to_stacked, decode at
B in {1, 2, 4}.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/quanto_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import quanto_tpu as qt
    from quanto_tpu.models.deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.parallel import convert_moe_to_stacked

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = DeepseekV3Config(
            vocab_size=32000, hidden_size=2048, intermediate_size=8192,
            moe_intermediate_size=1024, num_hidden_layers=12,
            num_attention_heads=16, q_lora_rank=512, kv_lora_rank=256,
            qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
            n_routed_experts=64, n_group=8, topk_group=4,
            num_experts_per_tok=6, n_shared_experts=2,
            first_k_dense_replace=1, dtype=jnp.bfloat16,
        )
        new = 32
    else:
        cfg = DeepseekV3Config(
            vocab_size=128, hidden_size=256, intermediate_size=512,
            moe_intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, q_lora_rank=32, kv_lora_rank=32,
            qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
            n_routed_experts=8, n_group=4, topk_group=2,
            num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, dtype=jnp.float32,
        )
        new = 4

    # Routed expert bytes at int4: E * 3 * h * mi / 2 per MoE layer.
    eb = cfg.n_routed_experts * 3 * cfg.hidden_size * cfg.moe_intermediate_size / 2
    log(f"expert bytes/layer {eb/2**20:.0f} MiB x {cfg.num_hidden_layers-1} MoE layers"
        f" = {(cfg.num_hidden_layers-1)*eb/2**30:.2f} GiB; top-{cfg.num_experts_per_tok}"
        f" of {cfg.n_routed_experts} -> selective streams"
        f" {cfg.num_experts_per_tok/cfg.n_routed_experts:.1%} of it at B=1")

    log("building deepseek-shaped model on host...")
    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
        qt.quantize(model, weights="qint4", exclude="lm_head")
        ops_config.set_backend(pallas_qbits=True)
        try:
            qt.freeze(model)
        finally:
            ops_config.set_backend()
    log(f"built in {time.time()-t0:.0f}s")

    def to_device(m):
        dev = jax.devices()[0]
        for _p, node in nnx.iter_graph(m):
            if isinstance(node, nnx.Variable):
                v = node.get_value()
                if v is not None:
                    node.set_value(jax.device_put(v, dev))

    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn

    T = 2048 if on_tpu else 32

    def measure(tag):
        import numpy as _np

        graphdef, state = nnx.split(model)
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
            log(f"{tag}: decode {best*1e3/new:.2f} ms/step, {B*new/best:.0f} tok/s (B={B})")
        # Prefill: dense-mask spends E x the useful routed-MLP FLOPs; the
        # capacity-gather batched-expert GEMM cuts it to ~cf*top_k.
        prefill = make_prefill_fn(graphdef)
        cache = model.init_kv_cache(1, T + 8, kv_quant="qint8")
        ids = jnp.asarray(
            _np.random.RandomState(0).randint(0, cfg.vocab_size, (1, T)), jnp.int32
        )
        logits, _ = prefill(state, ids, cache, 0)
        float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            logits, _ = prefill(state, ids, cache, 0)
            float(jax.device_get(jnp.sum(logits[:, -1].astype(jnp.float32))))
            best = min(best, time.time() - t0)
        log(f"{tag}: prefill {best*1e3:.0f} ms / {T} tokens = {T/best:.0f} tok/s")

    to_device(model)
    measure("dense-mask")
    # Convert IN PLACE on device (stacking device arrays: one jnp.stack per
    # projection, then the originals are freed).
    n = convert_moe_to_stacked(model, capacity_factor=2.0)
    log(f"converted {n} blocks to stacked dispatch")
    measure("stacked")


if __name__ == "__main__":
    main()
