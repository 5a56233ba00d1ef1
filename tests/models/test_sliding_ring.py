"""Shared sliding-window ring-cache plumbing (models/sliding.py) across the
alternating-attention families beyond GPT-OSS (whose ring tests live in
test_gpt_oss.py): gemma2 (1:1 pattern + softcap) and gemma3 (5:1 pattern +
dual rope)."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

from quanto_tpu.models.gemma2 import Gemma2Config, Gemma2ForCausalLM
from quanto_tpu.models.gemma3 import Gemma3TextConfig, Gemma3ForCausalLM
from quanto_tpu.tensor.kv_cache import cache_max_len


def _gemma2():
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=8, max_position_embeddings=64,
        dtype=jnp.float32,
    )
    return Gemma2ForCausalLM(cfg, rngs=nnx.Rngs(0))


def _gemma3():
    cfg = Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=8, sliding_window_pattern=3,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return Gemma3ForCausalLM(cfg, rngs=nnx.Rngs(1))


@pytest.mark.parametrize("family", ["gemma2", "gemma3"])
@pytest.mark.parametrize("kv_quant", [None, "qint8"])
def test_ring_matches_flat_cache(family, kv_quant):
    m = _gemma2() if family == "gemma2" else _gemma3()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 21)), jnp.int32)
    outs = {}
    for ring in (False, True):
        cache = m.init_kv_cache(1, 40, kv_quant=kv_quant, sliding_ring=ring)
        if ring:
            sl = [i for i, t in enumerate(m.config.layer_types)
                  if t == "sliding_attention"]
            fl = [i for i, t in enumerate(m.config.layer_types)
                  if t != "sliding_attention"]
            assert cache_max_len(cache[sl[0]]) == 8
            assert cache_max_len(cache[fl[0]]) == 40
        logits, cache = m(ids[:, :16], cache, 0)
        toks = [logits[:, -1]]
        for t in range(16, 21):
            step, cache = m(ids[:, t : t + 1], cache, t)
            toks.append(step[:, -1])
        outs[ring] = np.stack([np.asarray(t) for t in toks])
    a, b = outs[False].ravel(), outs[True].ravel()
    if kv_quant is None:
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    else:
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.9999, cos


@pytest.mark.parametrize("family", ["gemma2", "gemma3"])
def test_ring_through_engine_chunked(family):
    """Ring + the engine's fixed-shape chunk programs (write_len plumbing)
    for the gemma families: token-identical to single-sequence reference
    with non-chunk-multiple prompt lengths."""
    from quanto_tpu.models.serve import generate
    from quanto_tpu.models.serving import BatchedEngine

    m = _gemma2() if family == "gemma2" else _gemma3()
    rng = np.random.RandomState(2)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (17, 11)]
    n_new = 5
    refs = []
    for p in prompts:
        out = generate(m, jnp.asarray(np.asarray(p, np.int32)[None]), n_new)
        refs.append(np.asarray(out)[0, len(p):].tolist())
    engine = BatchedEngine(m, max_batch=2, max_len=32, prefill_chunk=6)
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion()
    for rid, ref in zip(rids, refs):
        assert engine.result(rid) == ref
