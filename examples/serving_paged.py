"""Continuous-batching serving with a paged KV cache.

Demonstrates the production-serving slice: an int8-weight llama with an int8
paged KV cache behind `PagedEngine` — requests stream in, share one page
pool, and finished slots release their pages immediately. Run on TPU:

    PYTHONPATH=/root/.axon_site:. python examples/serving_paged.py

(or on CPU with JAX_PLATFORMS=cpu for a functional demo).
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.sampling import make_sampler
from quanto_tpu.models.serving import PagedEngine


def main():
    config = LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512, dtype=jnp.bfloat16,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)

    engine = PagedEngine(
        model,
        max_batch=4,
        max_len=256,
        n_pages=33,          # 32 usable pages * 64 tokens = 2048 pooled tokens
        page_size=64,
        kv_quant="qint8",    # int8 cache pages
        sample_fn=make_sampler(temperature=0.8, top_p=0.95),
    )

    rng = np.random.RandomState(0)
    pending = [rng.randint(0, 2048, size=rng.randint(4, 32)).tolist() for _ in range(10)]
    done = {}

    while pending or engine.num_active:
        while pending and engine.can_add():
            prompt = pending.pop()
            try:
                rid = engine.add(prompt, max_new_tokens=32)
            except RuntimeError:  # page pool momentarily exhausted
                pending.append(prompt)
                break
            print(f"request {rid}: prompt len {len(prompt)}")
        engine.step()
        for rid, req in list(engine._requests.items()):
            if req.done and rid not in done:
                done[rid] = engine.result(rid)
                print(f"request {rid} finished: {len(done[rid])} tokens, "
                      f"{len(engine._free_pages)} pages free")

    print(f"served {len(done)} requests through a "
          f"{engine.n_pages * engine.page_size}-token page pool")


if __name__ == "__main__":
    main()
