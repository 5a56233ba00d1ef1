"""Paged KV cache: equivalence with the dense cache, page lifecycle."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.serving import BatchedEngine, PagedEngine
from quanto_tpu.tensor.paged_kv import init_paged_kv_cache


def _tiny():
    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return LlamaForCausalLM(config, rngs=nnx.Rngs(0))


@pytest.mark.parametrize(
    "kv_quant",
    [None, "qint8", "qint4", "k8v4", "qint4a"],
    ids=["float", "int8", "int4", "k8v4", "int4-asym"],
)
def test_paged_cache_matches_dense(kv_quant):
    """Prefill + decode through a page-table cache equals the dense cache
    (identity table: slot b owns pages [b*P .. b*P+P-1], page 0 kept free by
    using an offset)."""
    model = _tiny()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 6)), jnp.int32)

    dense = init_kv_cache(model.config, 2, 16, kv_quant=kv_quant)
    ref_logits, dense = model(ids[:, :4], dense, 0)
    ref_step, _ = model(ids[:, 4:5], dense, 4)

    ps, per_slot = 8, 2
    paged = init_paged_kv_cache(
        2, 1 + 2 * per_slot, ps, 2, per_slot, 2, 16, kv_quant=kv_quant,
        dtype=jnp.float32,
    )
    table = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    import dataclasses

    paged = tuple(dataclasses.replace(l, _table=table) for l in paged)
    logits, paged = model(ids[:, :4], paged, 0)
    step, _ = model(ids[:, 4:5], paged, 4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(step), np.asarray(ref_step), rtol=1e-5, atol=1e-5)


def test_paged_engine_matches_batched_engine():
    model = _tiny()
    prompts = [[1, 5, 17], [9, 2, 44, 7], [3, 3]]
    ref_engine = BatchedEngine(model, max_batch=4, max_len=32)
    ref_out = {}
    for p in prompts:
        rid = ref_engine.add(p, max_new_tokens=6)
        ref_out[rid] = p
    ref_engine.run_to_completion()

    engine = PagedEngine(model, max_batch=4, max_len=32, n_pages=17, page_size=8)
    out = {}
    for p in prompts:
        rid = engine.add(p, max_new_tokens=6)
        out[rid] = p
    engine.run_to_completion()
    for rid in out:
        assert engine.result(rid) == ref_engine.result(rid), rid


def test_paged_engine_page_reuse():
    """Pages released by finished requests serve later requests; the pool is
    smaller than the dense equivalent would need."""
    model = _tiny()
    # Dense equivalent needs 4 slots * 32 tokens = 128; give only 40 tokens
    # of pool (5 pages of 8) and run requests sequentially.
    engine = PagedEngine(model, max_batch=4, max_len=32, n_pages=6, page_size=8)
    for i in range(4):
        rid = engine.add([1 + i, 5, 9], max_new_tokens=4)
        engine.run_to_completion()
        assert engine.is_done(rid)
        assert len(engine.result(rid)) == 4
    assert len(engine._free_pages) == 5


def test_paged_engine_pool_exhaustion():
    # reserve="full" preallocates prompt + max_new pages, so over-commitment
    # is rejected at admission.
    model = _tiny()
    engine = PagedEngine(
        model, max_batch=4, max_len=32, n_pages=3, page_size=8, reserve="full"
    )
    engine.add([1, 2, 3], max_new_tokens=10)  # needs 2 pages
    with pytest.raises(RuntimeError, match="page pool exhausted"):
        engine.add([4, 5, 6], max_new_tokens=10)
    # The default (reserve="prompt") admits both: only prompt pages are
    # reserved up front and decode pages grow on demand (with preemption
    # under pressure).
    engine2 = PagedEngine(model, max_batch=4, max_len=32, n_pages=3, page_size=8)
    engine2.add([1, 2, 3], max_new_tokens=10)
    engine2.add([4, 5, 6], max_new_tokens=10)


def test_paged_engine_prefix_sharing_exact():
    """Requests sharing a prompt prefix reuse its KV pages and generate the
    same tokens as an engine with sharing disabled."""
    model = _tiny()
    base = [7, 1, 9, 2, 8, 3, 6, 4]  # two full pages at page_size=4
    prompts = [base + [11], base + [12, 13], base[:4] + [20, 21]]

    ref = PagedEngine(model, max_batch=4, max_len=32, n_pages=24, page_size=4,
                      prefix_sharing=False)
    shared = PagedEngine(model, max_batch=4, max_len=32, n_pages=24, page_size=4)
    results = []
    for eng in (ref, shared):
        rids = [eng.add(p, max_new_tokens=5) for p in prompts]
        eng.run_to_completion()
        results.append([eng.result(r) for r in rids])
    assert results[0] == results[1]
    assert ref.prefix_hits == 0
    # Request 2 reuses both base pages, request 3 reuses the first.
    assert shared.prefix_hits == 3
    assert shared.prefix_tokens_saved == 12


def test_paged_engine_prefix_pages_resident_and_evictable():
    """Prefix pages stay resident after release (serving a later identical
    prompt), and are evicted under pool pressure."""
    model = _tiny()
    base = [5, 6, 7, 8]
    engine = PagedEngine(model, max_batch=2, max_len=16, n_pages=5, page_size=4)
    rid = engine.add(base + [1], max_new_tokens=2)
    engine.run_to_completion()
    # The base page is registered and kept out of the free pool.
    assert len(engine._prefix_pages) == 1
    rid2 = engine.add(base + [2], max_new_tokens=2)
    engine.run_to_completion()
    assert engine.prefix_hits == 1
    # Pool pressure: rid3 needs all 4 usable pages, so the zero-ref base
    # prefix page must be evicted rather than erroring out.
    rid3 = engine.add([9] * 9, max_new_tokens=7)
    engine.run_to_completion()
    assert engine.is_done(rid3)
    base_key = np.asarray(base, np.int32).tobytes()
    assert base_key not in engine._prefix_pages
