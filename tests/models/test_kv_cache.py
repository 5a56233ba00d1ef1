"""Quantized KV cache tests: int8/fp8 cache decode stays close to the float
cache, and the cache pytree survives jit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.tensor.kv_cache import QKVCacheLayer

from ..helpers import assert_similar


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


@pytest.mark.parametrize("kv_quant", ["qint8", "qfloat8_e4m3fn"])
def test_quantized_kv_cache_close_to_float(model, kv_quant):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 10)), jnp.int32)
    full, _ = model(ids)

    # fp8 e4m3 has 3 mantissa bits -> looser tolerance than int8.
    rtol = 1e-3 if kv_quant == "qint8" else 5e-3
    cache = init_kv_cache(model.config, 2, 16, kv_quant=kv_quant)
    assert isinstance(cache[0], QKVCacheLayer)
    logits, cache = model(ids[:, :6], cache, 0)
    assert_similar(logits, full[:, :6], rtol=rtol)
    for t in range(6, 10):
        step, cache = model(ids[:, t : t + 1], cache, t)
        assert_similar(step[:, 0], full[:, t], rtol=rtol)


def test_quantized_kv_cache_under_jit(model):
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (1, 6)), jnp.int32)
    cache = init_kv_cache(model.config, 1, 8, kv_quant="qint8")
    graphdef, state = nnx.split(model)

    @jax.jit
    def prefill(state, ids, cache):
        m = nnx.merge(graphdef, state)
        return m(ids, cache, 0)

    logits, new_cache = prefill(state, ids, cache)
    assert isinstance(new_cache[0], QKVCacheLayer)
    ref, _ = model(ids)
    assert_similar(logits, ref, rtol=1e-3)
    assert new_cache[0]._k_data.dtype == jnp.int8
