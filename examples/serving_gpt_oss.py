"""GPT-OSS serving: sinks + sliding-window rings + stacked int4 experts.

The full round-5 GPT-OSS story in one demo:
- `quantize()` handles attention/lm_head (the 2880-dim projections ride the
  padded kernel layout automatically);
- `convert_gpt_oss_moe_to_stacked` quantizes the FUSED expert Params
  (untouchable by any module-swap quantizer) into the stacked sub-byte
  kernel layout — small-batch decode streams only the routed experts;
- `init_kv_cache` gives sliding layers window-sized RING buffers (2x KV
  pool cut at the released geometry), which the engine uses transparently;
- `enqueue()` + `serve_step()` interleave chunked prefill with decode so
  new arrivals never stall the token streams.

Run on TPU:

    PYTHONPATH=/root/.axon_site:. python examples/serving_gpt_oss.py

(or on CPU with JAX_PLATFORMS=cpu for a functional demo).
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import GptOssConfig, GptOssForCausalLM
from quanto_tpu.models.serving import BatchedEngine
from quanto_tpu.parallel import convert_gpt_oss_moe_to_stacked


def main():
    # A scaled-down GPT-OSS (the released 20b geometry is 24 layers of
    # hidden 2880 with 32 experts — bench/gpt_oss_bench.py --full drives
    # that size on a 16 GB chip at ~135 tok/s single-stream).
    config = GptOssConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        head_dim=64, num_local_experts=8, num_experts_per_tok=2,
        sliding_window=32, max_position_embeddings=512, dtype=jnp.bfloat16,
    )
    model = GptOssForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    qt.freeze(model)
    n = convert_gpt_oss_moe_to_stacked(model, weights="qint4")
    print(f"stacked {n} fused-expert blocks into the int4 kernel layout")

    engine = BatchedEngine(
        model,
        max_batch=4,
        max_len=256,          # sliding layers store only 32 ring slots
        kv_quant="qint8",
        prefill_chunk=32,     # prompts prefill in chunks riding decode steps
    )

    rng = np.random.RandomState(0)
    rids = [
        engine.enqueue(rng.randint(0, 2048, size=n).tolist(), max_new_tokens=24)
        for n in (40, 71, 19)
    ]
    # Mixed scheduling: each serve_step advances every pending prefill by
    # one chunk AND decodes one token for every active stream.
    while any(not engine.is_done(r) for r in rids):
        engine.serve_step(burst=8)
    for r in rids:
        print(f"request {r}: {engine.result(r)}")


if __name__ == "__main__":
    main()
