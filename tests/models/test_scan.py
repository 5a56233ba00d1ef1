"""Scan-over-layers execution matches the unrolled model exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.scan import stack_cache, stack_model


def _tiny(dtype=jnp.float32):
    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=dtype,
    )
    return LlamaForCausalLM(config, rngs=nnx.Rngs(0))


@pytest.mark.parametrize("quantize", [None, "qint8"], ids=["float", "int8"])
def test_stacked_matches_unrolled_no_cache(quantize):
    model = _tiny()
    if quantize:
        qt.quantize(model, weights=quantize, exclude="lm_head")
        qt.freeze(model)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 6)), jnp.int32)
    ref, _ = model(ids)
    runner = stack_model(model)
    out, _ = runner(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv_quant", [None, "qint8"], ids=["floatcache", "int8cache"])
def test_stacked_decode_with_cache(kv_quant):
    model = _tiny()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 6)), jnp.int32)

    cache = init_kv_cache(model.config, 2, 16, kv_quant=kv_quant)
    ref_logits, ref_cache = model(ids[:, :4], cache, 0)
    ref_step, _ = model(ids[:, 4:5], ref_cache, 4)

    runner = stack_model(model)
    scache = runner.init_kv_cache(2, 16, kv_quant=kv_quant)
    logits, scache = runner(ids[:, :4], scache, 0)
    step, _ = runner(ids[:, 4:5], scache, 4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(step), np.asarray(ref_step), rtol=1e-5, atol=1e-5)


def test_stacked_apply_jits():
    model = _tiny()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    runner = stack_model(model)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (1, 4)), jnp.int32)
    cache = runner.init_kv_cache(1, 8)
    fn = jax.jit(runner.apply)
    logits, cache2 = fn(runner.state, ids, cache, 0)
    ref, _ = runner(ids, cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_stacked_serve_fns_match_unrolled_serve():
    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn, make_stacked_fns

    model = _tiny()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 128, (2, 4)), jnp.int32)

    graphdef, state = nnx.split(model)
    cache = init_kv_cache(model.config, 2, 16)
    logits, cache = make_prefill_fn(graphdef)(state, ids, cache, 0)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    ref_toks, _ = make_decode_fn(graphdef, 5)(state, first, cache, 4)

    runner, prefill, decode = make_stacked_fns(model, 5)
    scache = runner.init_kv_cache(2, 16)
    slogits, scache = prefill(runner.state, ids, scache, 0)
    sfirst = jnp.argmax(slogits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    toks, _ = decode(runner.state, sfirst, scache, 4)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
