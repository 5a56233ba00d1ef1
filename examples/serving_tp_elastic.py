"""Tensor-parallel quantized serving with elastic checkpointing.

Round-2 capabilities in one script: an int4 llama sharded over a dp x tp
mesh (column-parallel N shards + block-local row-parallel K shards — the
packed payload bytes divide across "tp"), served through the
continuous-batching engine, with an elastic checkpoint written atomically.

Runs anywhere: on a TPU slice the mesh uses the real chips; on CPU set
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh.

    python examples/serving_tp_elastic.py
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serving import BatchedEngine
from quanto_tpu.ops import config as ops_config
from quanto_tpu.parallel import (
    LLAMA_TP_RULES,
    ElasticCheckpointer,
    make_mesh,
    shard_model,
)


def main():
    config = LlamaConfig(
        vocab_size=256, hidden_size=1024, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)  # TPU kernel layout (shardable)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()

    n = len(jax.devices())
    tp = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = make_mesh({"dp": n // tp, "tp": tp})
    shard_model(model, mesh, LLAMA_TP_RULES)
    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    print(f"mesh {dict(mesh.shape)}; down_proj payload spec: {down._packed.sharding.spec} "
          f"(k_shards={down.k_shards}, per-device bytes = total/{tp})")

    # Elastic checkpoint of the sharded quantized model.
    ckpt = ElasticCheckpointer("/tmp/quanto_tpu_example_ckpt", interval_steps=1, keep=1)
    ckpt.save(0, model)
    print(f"checkpoint written: step {ckpt.latest()}")

    engine = BatchedEngine(model, max_batch=4, max_len=64, kv_quant="qint8", mesh=mesh)
    prompts = [[1, 17, 9, 4], [3, 3, 8], [250, 2, 91, 77, 5]]
    rids = [engine.add(p, max_new_tokens=12) for p in prompts]
    engine.run_to_completion()
    for rid, p in zip(rids, prompts):
        print(f"prompt {p} -> {engine.result(rid)}")


if __name__ == "__main__":
    main()
