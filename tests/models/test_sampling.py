"""Sampling strategy tests: greedy equivalence, temperature/top-k/top-p
filtering, and stochastic decode through the scan decoder."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.sampling import greedy, make_sampler
from quanto_tpu.models.serve import make_decode_fn


def test_greedy_is_argmax():
    logits = jnp.asarray([[1.0, 3.0, 2.0], [0.5, 0.1, 0.9]])
    np.testing.assert_array_equal(np.asarray(greedy(logits)), [1, 2])


def test_temperature_zero_is_greedy():
    s = make_sampler(temperature=0.0)
    assert s is greedy


def test_top_k_filters_tail():
    logits = jnp.asarray([[10.0, 9.0, -5.0, -6.0]])
    s = make_sampler(temperature=1.0, top_k=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    draws = {int(s(logits, k)[0]) for k in keys}
    assert draws <= {0, 1}


def test_top_p_keeps_nucleus():
    # One dominant token: nucleus at 0.5 keeps only it.
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    s = make_sampler(temperature=1.0, top_p=0.5)
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    draws = {int(s(logits, k)[0]) for k in keys}
    assert draws == {0}


def test_sampled_decode_runs_and_differs_by_key():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)
    decode = make_decode_fn(graphdef, 8, sample_fn=make_sampler(temperature=1.0, top_k=20))
    cache = init_kv_cache(cfg, 1, 16)
    first = jnp.zeros((1, 1), jnp.int32)
    t1, _ = decode(state, first, cache, 0, jax.random.PRNGKey(0))
    t2, _ = decode(state, first, cache, 0, jax.random.PRNGKey(7))
    assert t1.shape == (1, 8)
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_engine_with_sampler():
    from quanto_tpu.models.serving import BatchedEngine

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    engine = BatchedEngine(model, max_batch=2, max_len=32,
                           sample_fn=make_sampler(temperature=0.8, top_k=10))
    rid = engine.add(np.random.RandomState(0).randint(0, 128, 5).tolist(), max_new_tokens=6)
    engine.run_to_completion()
    assert len(engine.result(rid)) == 6


def test_top_k_one_is_greedy():
    # Regression: [..., -k:-k+1] was an empty slice at k=1 and crashed.
    import jax
    import numpy as np
    from quanto_tpu.models.sampling import make_logits_warp, make_sampler

    logits = jnp.asarray(np.random.RandomState(0).randn(4, 16))
    warped = make_logits_warp(1.0, top_k=1)(logits)
    assert (jnp.sum(jnp.isfinite(warped), axis=-1) == 1).all()
    ids = make_sampler(temperature=1.0, top_k=1)(logits, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(jnp.argmax(logits, -1)))
