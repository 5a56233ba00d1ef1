"""Speculative decoding: greedy spec output must EXACTLY equal the target
model's own greedy generation, regardless of the draft model's quality —
the defining correctness property. Also checks the self-draft fast path
(draft == target accepts everything) and quantized target+draft pairs."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.serve import generate
from quanto_tpu.models.speculative import speculative_generate


def _llama(seed=0, layers=2, hidden=64):
    config = LlamaConfig(
        vocab_size=128, hidden_size=hidden, intermediate_size=2 * hidden,
        num_hidden_layers=layers, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    return LlamaForCausalLM(config, rngs=nnx.Rngs(seed))


def _prompt(batch=1, T=8, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randint(0, 128, (batch, T)), jnp.int32
    )


def test_speculative_equals_target_greedy():
    target = _llama(seed=0)
    draft = _llama(seed=7, layers=1, hidden=32)  # unrelated tiny draft
    ids = _prompt()
    ref = generate(target, ids, max_new_tokens=24)
    out, acceptance = speculative_generate(target, draft, ids, max_new_tokens=24, k=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert 0.0 <= acceptance <= 1.0


def test_speculative_self_draft_accepts_all():
    target = _llama(seed=0)
    ids = _prompt(seed=1)
    ref = generate(target, ids, max_new_tokens=16)
    out, acceptance = speculative_generate(target, target, ids, max_new_tokens=16, k=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert acceptance == 1.0  # identical models agree on every draft


def test_speculative_batch_rows_diverge():
    target = _llama(seed=0)
    draft = _llama(seed=3, layers=1, hidden=32)
    ids = _prompt(batch=3, seed=2)
    ref = generate(target, ids, max_new_tokens=12)
    out, _ = speculative_generate(target, draft, ids, max_new_tokens=12, k=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_quantized_pair():
    target = _llama(seed=0)
    qt.quantize(target, weights="qint8", exclude="lm_head")
    qt.freeze(target)
    draft = _llama(seed=5, layers=1, hidden=32)
    qt.quantize(draft, weights="qint8", exclude="lm_head")
    qt.freeze(draft)
    ids = _prompt(seed=4)
    ref = generate(target, ids, max_new_tokens=16)
    out, _ = speculative_generate(target, draft, ids, max_new_tokens=16, k=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
