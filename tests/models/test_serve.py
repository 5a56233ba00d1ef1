"""Serving loop tests: the jitted scan decoder matches eager generation, and
works with quantized weights and quantized KV caches."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serve import generate


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


def test_scan_decode_matches_eager_generate(model):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 6)), jnp.int32)
    eager = model.generate(ids, max_new_tokens=5)
    scanned = generate(model, ids, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(scanned))


def test_scan_decode_quantized_model(model):
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (1, 6)), jnp.int32)
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    out = generate(model, ids, max_new_tokens=5)
    assert out.shape == (1, 11)
    # Prompt is preserved verbatim.
    np.testing.assert_array_equal(np.asarray(out[:, :6]), np.asarray(ids))
