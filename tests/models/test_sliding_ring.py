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


def test_paged_ring_hybrid_gpt_oss():
    """PagedEngine + sliding family = HYBRID cache: full layers share the
    page pool, sliding layers get dense W-slot rings (no point paging a
    window). Token-identical to single-sequence generation, including
    slot reuse over stale ring content. Prefix sharing is auto-disabled
    under the hybrid (window-key dependencies compound per sliding layer —
    the vLLM rule for sliding-window models)."""
    from quanto_tpu.models import GptOssConfig, GptOssForCausalLM
    from quanto_tpu.models.serve import generate
    from quanto_tpu.models.serving import PagedEngine
    from quanto_tpu.tensor.kv_cache import QKVCacheLayer
    from quanto_tpu.tensor.paged_kv import PagedKVLayer

    cfg = GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=64, dtype=jnp.float32,
    )
    m = GptOssForCausalLM(cfg, rngs=nnx.Rngs(8))
    rng = np.random.RandomState(9)
    shared_prefix = rng.randint(0, 128, size=16).tolist()
    prompts = [
        shared_prefix + rng.randint(0, 128, size=5).tolist(),
        rng.randint(0, 128, size=11).tolist(),
        shared_prefix + rng.randint(0, 128, size=9).tolist(),  # prefix reuse
    ]
    n_new = 5
    refs = []
    for p in prompts:
        out = generate(m, jnp.asarray(np.asarray(p, np.int32)[None]), n_new)
        refs.append(np.asarray(out)[0, len(p):].tolist())

    engine = PagedEngine(
        m, max_batch=2, max_len=32, n_pages=17, page_size=8,
        kv_quant="qint8", prefix_sharing=True,
    )
    # Hybrid layout: layer 0 sliding -> dense ring; layer 1 full -> paged.
    assert isinstance(engine._cache[0], QKVCacheLayer)
    assert engine._cache[0]._k_data.shape[1] == 8
    assert isinstance(engine._cache[1], PagedKVLayer)
    assert not engine.prefix_sharing  # auto-disabled under the hybrid

    # Two waves through 2 slots: the second wave reuses slots whose ring
    # rows hold the first wave's stale keys.
    got = []
    for p in prompts[:2]:
        got.append(engine.add(p, max_new_tokens=n_new))
    engine.run_to_completion()
    r3 = engine.add(prompts[2], max_new_tokens=n_new)
    engine.run_to_completion()
    results = [engine.result(r) for r in got] + [engine.result(r3)]
    # int8-KV engine vs float-cache reference: near-identical greedy tokens.
    agree = sum(a == b for ref, out in zip(refs, results) for a, b in zip(ref, out))
    assert agree >= 13, (refs, results)
