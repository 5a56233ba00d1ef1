"""Continuous-batching engine tests: batched ragged decode matches
single-sequence generation exactly, slots recycle, quantized caches work."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serve import generate
from quanto_tpu.models.serving import BatchedEngine


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    m = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(m, weights="qint8", exclude="lm_head")
    qt.freeze(m)
    return m


def _ref_generate(model, prompt, n):
    out = generate(model, jnp.asarray(np.asarray(prompt, np.int32)[None]), n)
    return np.asarray(out)[0, len(prompt):].tolist()


def test_engine_matches_single_sequence(model):
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9, 3)]
    n_new = 6
    refs = [_ref_generate(model, p, n_new) for p in prompts]

    engine = BatchedEngine(model, max_batch=4, max_len=32)
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion()
    for rid, ref in zip(rids, refs):
        assert engine.is_done(rid)
        assert engine.result(rid) == ref


def test_engine_slot_recycling(model):
    rng = np.random.RandomState(1)
    engine = BatchedEngine(model, max_batch=2, max_len=32)
    # Fill both slots, finish them, then reuse for a third request.
    r1 = engine.add(rng.randint(0, 128, 4).tolist(), max_new_tokens=3)
    r2 = engine.add(rng.randint(0, 128, 6).tolist(), max_new_tokens=3)
    assert not engine.can_add()
    engine.run_to_completion()
    assert engine.can_add()
    p3 = rng.randint(0, 128, 5).tolist()
    r3 = engine.add(p3, max_new_tokens=4)
    engine.run_to_completion()
    assert engine.result(r3) == _ref_generate(model, p3, 4)


def test_engine_ragged_midstream_add(model):
    """A request added while others are mid-decode still decodes correctly."""
    rng = np.random.RandomState(2)
    p1 = rng.randint(0, 128, 7).tolist()
    p2 = rng.randint(0, 128, 4).tolist()
    n = 5
    ref1 = _ref_generate(model, p1, n)
    ref2 = _ref_generate(model, p2, n)
    engine = BatchedEngine(model, max_batch=4, max_len=32)
    r1 = engine.add(p1, max_new_tokens=n)
    engine.step()
    engine.step()
    r2 = engine.add(p2, max_new_tokens=n)  # joins mid-stream
    engine.run_to_completion()
    assert engine.result(r1) == ref1
    assert engine.result(r2) == ref2


def test_engine_quantized_kv_cache(model):
    rng = np.random.RandomState(3)
    p = rng.randint(0, 128, 6).tolist()
    engine = BatchedEngine(model, max_batch=2, max_len=32, kv_quant="qint8")
    rid = engine.add(p, max_new_tokens=4)
    engine.run_to_completion()
    assert len(engine.result(rid)) == 4


def test_engine_chunked_prefill_matches_unchunked(model):
    """prefill_chunk pads prompts into fixed-size pieces; tokens must be
    identical to whole-prompt prefill for every ragged length (incl. lengths
    that are exact multiples of the chunk and a final partial chunk)."""
    rng = np.random.RandomState(1)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 8, 3, 11)]
    n_new = 6
    refs = [_ref_generate(model, p, n_new) for p in prompts]

    engine = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion()
    for rid, ref in zip(rids, refs):
        assert engine.result(rid) == ref


def test_engine_chunked_prefill_near_capacity(model):
    """A final partial chunk whose padding would spill past max_len falls
    back to the variable-shape program instead of corrupting the cache.
    Here: len 13, chunk 8, max_len 14 -> second chunk (5 tokens at offset 8)
    would pad to 8+8=16 > 14, so it must take the fallback branch."""
    rng = np.random.RandomState(2)
    prompt = rng.randint(0, 128, size=13).tolist()
    ref = _ref_generate(model, prompt, 1)
    engine = BatchedEngine(model, max_batch=1, max_len=14, prefill_chunk=8)
    rid = engine.add(prompt, max_new_tokens=1)
    engine.run_to_completion()
    assert engine.result(rid) == ref


def test_paged_engine_chunked_prefill_with_prefix_sharing(model):
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(3)
    base = rng.randint(0, 128, size=9).tolist()
    p1 = base + rng.randint(0, 128, size=3).tolist()
    p2 = base + rng.randint(0, 128, size=2).tolist()
    n_new = 5
    refs = [_ref_generate(model, p, n_new) for p in (p1, p2)]

    engine = PagedEngine(
        model, max_batch=2, max_len=32, n_pages=17, page_size=4,
        prefix_sharing=True, prefill_chunk=4,
    )
    r1 = engine.add(p1, max_new_tokens=n_new)
    engine.run_to_completion()
    r2 = engine.add(p2, max_new_tokens=n_new)
    engine.run_to_completion()
    assert engine.result(r1) == refs[0]
    assert engine.result(r2) == refs[1]
    assert engine.prefix_hits > 0  # suffix-only prefill exercised chunking at offset


def test_decode_burst_matches_stepwise(model):
    """run_to_completion(burst=k) must be token-identical to step-by-step
    (same sampler key-split sequence inside the scanned burst)."""
    rng = np.random.RandomState(4)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9, 3)]
    n_new = 7  # not a multiple of the burst size

    ref_engine = BatchedEngine(model, max_batch=4, max_len=32)
    rids = [ref_engine.add(p, max_new_tokens=n_new) for p in prompts]
    ref_engine.run_to_completion()
    refs = [ref_engine.result(r) for r in rids]

    engine = BatchedEngine(model, max_batch=4, max_len=32)
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion(burst=4)
    for rid, ref in zip(rids, refs):
        assert engine.result(rid) == ref


def test_decode_burst_stochastic_sampler_matches_stepwise(model):
    from quanto_tpu.models.sampling import make_sampler

    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 128, size=6).tolist()
    n_new = 6

    def build():
        return BatchedEngine(
            model, max_batch=2, max_len=32,
            sample_fn=make_sampler(temperature=0.8, top_k=8),
        )

    e1 = build()
    r1 = e1.add(prompt, max_new_tokens=n_new)
    e1.run_to_completion()
    e2 = build()
    r2 = e2.add(prompt, max_new_tokens=n_new)
    e2.run_to_completion(burst=4)
    assert e1.result(r1) == e2.result(r2)


def test_decode_burst_eos_mid_burst(model):
    """A slot hitting eos inside a burst keeps only tokens up to eos and its
    slot frees; other slots continue."""
    rng = np.random.RandomState(6)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 7)]
    n_new = 8
    probe = BatchedEngine(model, max_batch=2, max_len=32)
    rids = [probe.add(p, max_new_tokens=n_new) for p in prompts]
    probe.run_to_completion()
    seq = probe.result(rids[0])
    eos = seq[2]  # third generated token of request 0 becomes the eos

    def run(burst):
        e = BatchedEngine(model, max_batch=2, max_len=32, eos_token_id=eos)
        rs = [e.add(p, max_new_tokens=n_new) for p in prompts]
        e.run_to_completion(burst=burst)
        return [e.result(r) for r in rs], e

    refs, _ = run(None)
    outs, engine = run(8)
    assert outs == refs
    assert len(engine._free) == 2  # both slots released


def test_paged_engine_decode_burst(model):
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(7)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9)]
    n_new = 6
    ref = PagedEngine(model, max_batch=2, max_len=32, n_pages=17, page_size=4)
    rids = [ref.add(p, max_new_tokens=n_new) for p in prompts]
    ref.run_to_completion()
    refs = [ref.result(r) for r in rids]

    e = PagedEngine(model, max_batch=2, max_len=32, n_pages=17, page_size=4)
    rids = [e.add(p, max_new_tokens=n_new) for p in prompts]
    e.run_to_completion(burst=4)
    for rid, r in zip(rids, refs):
        assert e.result(rid) == r


def test_paged_engine_on_demand_growth_matches_full_reserve(model):
    """reserve="prompt" (on-demand page growth) must be token-identical to
    reserve="full" (worst-case preallocation) when the pool never runs dry."""
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(11)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9)]
    n_new = 7

    outs = {}
    for reserve in ("full", "prompt"):
        e = PagedEngine(
            model, max_batch=2, max_len=32, n_pages=17, page_size=4,
            reserve=reserve,
        )
        rids = [e.add(p, max_new_tokens=n_new) for p in prompts]
        e.run_to_completion(burst=4)
        outs[reserve] = [e.result(r) for r in rids]
        assert e.preemptions == 0
    assert outs["prompt"] == outs["full"]


def test_paged_engine_preemption_recompute(model):
    """A pool too small for both sequences' full lengths forces on-demand
    growth to preempt the youngest request; after recompute its tokens are
    identical to an uncontended run (greedy sampling)."""
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(12)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (9, 9)]
    n_new = 12  # final lengths 21 + 21 tokens

    ref = PagedEngine(
        model, max_batch=2, max_len=32, n_pages=17, page_size=4,
        prefix_sharing=False,
    )
    rids = [ref.add(p, max_new_tokens=n_new) for p in prompts]
    ref.run_to_completion()
    refs = [ref.result(r) for r in rids]

    # 9 usable pages * 4 = 36 token capacity < 42 needed concurrently: the
    # youngest request must be preempted mid-decode and recomputed.
    e = PagedEngine(
        model, max_batch=2, max_len=32, n_pages=10, page_size=4,
        prefix_sharing=False,
    )
    rids = [e.add(p, max_new_tokens=n_new) for p in prompts]
    e.run_to_completion()
    assert e.preemptions > 0
    for rid, r in zip(rids, refs):
        assert e.is_done(rid)
        assert e.result(rid) == r


def test_paged_engine_preemption_recompute_burst(model):
    """Same preemption scenario driven through decode_burst."""
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(13)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (9, 9)]
    n_new = 12

    ref = PagedEngine(
        model, max_batch=2, max_len=32, n_pages=17, page_size=4,
        prefix_sharing=False,
    )
    rids = [ref.add(p, max_new_tokens=n_new) for p in prompts]
    ref.run_to_completion()
    refs = [ref.result(r) for r in rids]

    e = PagedEngine(
        model, max_batch=2, max_len=32, n_pages=10, page_size=4,
        prefix_sharing=False,
    )
    rids = [e.add(p, max_new_tokens=n_new) for p in prompts]
    e.run_to_completion(burst=4)
    assert e.preemptions > 0
    for rid, r in zip(rids, refs):
        assert e.result(rid) == r


def test_paged_engine_single_request_pool_exhaustion_raises(model):
    from quanto_tpu.models.serving import PagedEngine

    rng = np.random.RandomState(14)
    prompt = rng.randint(0, 128, size=9).tolist()
    e = PagedEngine(
        model, max_batch=1, max_len=32, n_pages=4, page_size=4,
        prefix_sharing=False,
    )
    e.add(prompt, max_new_tokens=12)  # needs 6 pages; pool has 3 usable
    with pytest.raises(RuntimeError, match="page pool exhausted by a single"):
        e.run_to_completion()


def test_add_batch_matches_serial_adds(model):
    """Batched chunked prefill must produce the same tokens as serial add()
    for every request (same logits rows, same sampler key order)."""
    rng = np.random.RandomState(8)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 11, 3, 8)]
    n_new = 5

    ref = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    rids = [ref.add(p, max_new_tokens=n_new) for p in prompts]
    ref.run_to_completion()
    refs = [ref.result(r) for r in rids]

    e = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    rids = e.add_batch(prompts, max_new_tokens=n_new)
    assert len(rids) == len(prompts)
    e.run_to_completion(burst=4)
    for rid, r in zip(rids, refs):
        assert e.result(rid) == r


def test_add_batch_with_active_decodes(model):
    """add_batch while other slots are mid-generation must not corrupt their
    caches (garbage chunk rows land at >= their next decode position)."""
    rng = np.random.RandomState(9)
    p_active = rng.randint(0, 128, size=6).tolist()
    p_new = [rng.randint(0, 128, size=L).tolist() for L in (4, 7)]
    n_new = 6

    ref = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    ra = ref.add(p_active, max_new_tokens=n_new)
    for _ in range(2):
        ref.step()
    rn = [ref.add(p, max_new_tokens=n_new) for p in p_new]
    ref.run_to_completion()
    expected = [ref.result(r) for r in (ra, *rn)]

    e = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    ea = e.add(p_active, max_new_tokens=n_new)
    for _ in range(2):
        e.step()
    en = e.add_batch(p_new, max_new_tokens=n_new)
    e.run_to_completion()
    got = [e.result(r) for r in (ea, *en)]
    assert got == expected


def test_add_batch_overflow_falls_back_to_serial(model):
    """More prompts than free slots: the overflow errors like serial add."""
    rng = np.random.RandomState(10)
    prompts = [rng.randint(0, 128, size=4).tolist() for _ in range(5)]
    e = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="no free slots"):
        e.add_batch(prompts, max_new_tokens=4)


def test_engine_with_stacked_moe_model():
    """MoE serving: a Mixtral with stacked-expert Pallas dispatch
    (StackedSparseMoeBlock) drains through the continuous-batching engine
    token-identically to the same model's dense-mask reference."""
    from quanto_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.parallel import convert_moe_to_stacked

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
        num_local_experts=4, num_experts_per_tok=2,
    )
    m = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(m, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(m)
    finally:
        ops_config.set_backend()
    rng = np.random.RandomState(2)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 8)]
    n_new = 4
    refs = [_ref_generate(m, p, n_new) for p in prompts]

    assert convert_moe_to_stacked(m) == 2
    engine = BatchedEngine(m, max_batch=2, max_len=32)
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion()
    got = [engine.result(r) for r in rids]
    # int4 kernel-path numerics vs the dense-mask XLA reference: greedy
    # tokens should agree on the vast majority of steps at this scale.
    agree = sum(a == b for ref, out in zip(refs, got) for a, b in zip(ref, out))
    assert agree >= 6, (refs, got)


# --- mixed prefill/decode scheduling (enqueue + serve_step) ----------------


def test_enqueue_matches_reference(model):
    """enqueue()'d requests (chunked prefill via mixed steps) decode the
    exact same tokens as single-sequence generation."""
    rng = np.random.RandomState(10)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9, 3, 12)]
    n_new = 6
    refs = [_ref_generate(model, p, n_new) for p in prompts]
    engine = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    rids = [engine.enqueue(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion()
    for rid, ref in zip(rids, refs):
        assert engine.is_done(rid)
        assert engine.result(rid) == ref


def test_enqueue_does_not_stall_decode(model):
    """A request enqueued while others decode advances THEIR decode on every
    mixed chunk step: after the new prompt's prefill chunks are consumed, the
    active rows have produced one token per chunk — and all tokens match the
    reference."""
    rng = np.random.RandomState(11)
    p1 = rng.randint(0, 128, 6).tolist()
    p2 = rng.randint(0, 128, 4).tolist()
    p3 = rng.randint(0, 128, 12).tolist()  # 3 chunks of 4
    n = 8
    ref1 = _ref_generate(model, p1, n)
    ref2 = _ref_generate(model, p2, n)
    ref3 = _ref_generate(model, p3, n)
    engine = BatchedEngine(model, max_batch=4, max_len=32, prefill_chunk=4)
    r1 = engine.add(p1, max_new_tokens=n)
    r2 = engine.add(p2, max_new_tokens=n)
    engine.step()  # both mid-decode (2 tokens each)
    r3 = engine.enqueue(p3, max_new_tokens=n)
    before = {r1: len(engine.result(r1)), r2: len(engine.result(r2))}
    # Drain p3's three prefill chunks as mixed steps: decode rows advance too.
    for _ in range(3):
        out = engine.serve_step()
        assert r1 in out and r2 in out  # decode rode the chunk program
    assert len(engine.result(r1)) == before[r1] + 3
    assert r3 in out  # final chunk emitted p3's first token
    engine.run_to_completion(burst=4)
    assert engine.result(r1) == ref1
    assert engine.result(r2) == ref2
    assert engine.result(r3) == ref3


def test_enqueue_overflow_waits_for_slot(model):
    """More enqueues than slots: the overflow waits in the admission queue
    and still decodes correctly once a slot frees."""
    rng = np.random.RandomState(12)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 7, 4)]
    refs = [_ref_generate(model, p, 4) for p in prompts]
    engine = BatchedEngine(model, max_batch=2, max_len=32, prefill_chunk=4)
    rids = [engine.enqueue(p, max_new_tokens=4) for p in prompts]
    assert not engine.is_done(rids[2])
    engine.run_to_completion(burst=4)
    for rid, ref in zip(rids, refs):
        assert engine.result(rid) == ref


def test_enqueue_near_capacity_decode_row(model):
    """A decoding row within C of max_len blocks mixed garbage writes:
    serve_step falls back to plain decode steps until it finishes, then the
    pending prefill proceeds — tokens stay exact throughout."""
    rng = np.random.RandomState(13)
    p1 = rng.randint(0, 128, 10).tolist()
    n1 = 5  # 10 + 5 = 15 > max_len - C = 16 - 8 = 8 -> _mixed_ok False
    p2 = rng.randint(0, 128, 6).tolist()
    ref1 = _ref_generate(model, p1, n1)
    ref2 = _ref_generate(model, p2, 3)
    engine = BatchedEngine(model, max_batch=2, max_len=16, prefill_chunk=8)
    r1 = engine.add(p1, max_new_tokens=n1)
    r2 = engine.enqueue(p2, max_new_tokens=3)
    assert not engine._mixed_ok()
    engine.run_to_completion()
    assert engine.result(r1) == ref1
    assert engine.result(r2) == ref2


def test_enqueue_spilling_prompt_falls_back_to_add(model):
    """ceil(len/C)*C > max_len: enqueue falls back to blocking add()."""
    rng = np.random.RandomState(14)
    prompt = rng.randint(0, 128, size=13).tolist()  # ceil(13/8)*8 = 16 > 14
    ref = _ref_generate(model, prompt, 1)
    engine = BatchedEngine(model, max_batch=1, max_len=14, prefill_chunk=8)
    rid = engine.enqueue(prompt, max_new_tokens=1)
    assert len(engine.result(rid)) >= 1  # prefilled immediately (blocking path)
    engine.run_to_completion()
    assert engine.result(rid) == ref


# --- sequence-parallel (sp) serving ----------------------------------------


def _sp_engine_tokens(model, mesh, prompts, n_new, kv_quant=None, burst=None):
    engine = BatchedEngine(
        model, max_batch=4, max_len=32, mesh=mesh, kv_quant=kv_quant,
        prefill_chunk=4,
    )
    rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion(burst=burst)
    return [engine.result(r) for r in rids]


def test_sp_engine_matches_unsharded(model):
    """An engine over a mesh with an "sp" axis shards the pooled cache along
    S and decodes through cp_cached_attention — tokens must match the
    unsharded engine exactly (the distributed online softmax is exact)."""
    from quanto_tpu.parallel import make_mesh

    rng = np.random.RandomState(20)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 9, 12)]
    n_new = 6
    refs = [_ref_generate(model, p, n_new) for p in prompts]
    mesh = make_mesh({"sp": 4, "x": 2})
    toks = _sp_engine_tokens(model, mesh, prompts, n_new)
    assert toks == refs


def test_sp_engine_quantized_cache_and_burst(model):
    """sp serving over a QUANTIZED sequence-sharded cache, drained with
    scanned bursts and mixed chunked prefill (enqueue)."""
    from quanto_tpu.parallel import make_mesh

    rng = np.random.RandomState(21)
    prompts = [rng.randint(0, 128, size=L).tolist() for L in (7, 11)]
    n_new = 5
    mesh = make_mesh({"sp": 8})
    engine = BatchedEngine(
        model, max_batch=2, max_len=32, mesh=mesh, kv_quant="qint8",
        prefill_chunk=4,
    )
    ref_engine = BatchedEngine(model, max_batch=2, max_len=32, kv_quant="qint8")
    rr = [ref_engine.add(p, max_new_tokens=n_new) for p in prompts]
    ref_engine.run_to_completion()
    rids = [engine.enqueue(p, max_new_tokens=n_new) for p in prompts]
    engine.run_to_completion(burst=4)
    for rid, r in zip(rids, rr):
        assert engine.result(rid) == ref_engine.result(r)


def test_engine_with_gpt_oss_model():
    """GPT-OSS serving: attention sinks + alternating sliding window +
    stacked fused experts drain through the continuous-batching engine
    token-identically to single-sequence generation, and the engine's
    kv_quant spec flows through the family's own init_kv_cache (round-5
    fix: it was silently dropped for models defining one)."""
    from quanto_tpu.models import GptOssConfig, GptOssForCausalLM
    from quanto_tpu.ops import config as ops_config
    from quanto_tpu.parallel import convert_gpt_oss_moe_to_stacked
    from quanto_tpu.tensor.kv_cache import QKVCacheLayer

    cfg = GptOssConfig(
        vocab_size=128, hidden_size=512, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=64, dtype=jnp.float32,
    )
    m = GptOssForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(m, weights="qint8", exclude="lm_head")
    qt.freeze(m)
    ops_config.set_backend(pallas_qbits=True)
    try:
        assert convert_gpt_oss_moe_to_stacked(m, weights="qint4") == 2

        rng = np.random.RandomState(3)
        prompts = [rng.randint(0, 128, size=L).tolist() for L in (5, 11)]
        n_new = 5
        refs = [_ref_generate(m, p, n_new) for p in prompts]

        engine = BatchedEngine(m, max_batch=2, max_len=32, kv_quant="qint8")
        assert isinstance(engine._cache[0], QKVCacheLayer)  # spec honored
        rids = [engine.add(p, max_new_tokens=n_new) for p in prompts]
        engine.run_to_completion()
        got = [engine.result(r) for r in rids]
    finally:
        ops_config.set_backend()
    # int8-KV engine vs float-cache reference: greedy tokens should agree
    # on the vast majority of steps at this scale.
    agree = sum(a == b for ref, out in zip(refs, got) for a, b in zip(ref, out))
    assert agree >= 8, (refs, got)
