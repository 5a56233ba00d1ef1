"""Causal flash prefill (`ops/attention.try_flash_prefill`): the fused
splash path must match the einsum path at the logits level, only engage on
statically causal-from-zero steps, and leave the cache identical for the
decode continuation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.attention import static_zero_pos


@pytest.fixture
def model():
    # head_dim 128 (the kernel envelope); tiny everywhere else.
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=512, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


def _prefill_logits(model, ids, kv_quant=None, flash=False, pos0=0):
    graphdef, state = nnx.split(model)
    cache = init_kv_cache(model.config, ids.shape[0], ids.shape[1] + 8, kv_quant=kv_quant)
    ops_config.set_backend(flash_prefill=flash)
    try:
        m = nnx.merge(graphdef, state)
        logits, cache = m(ids, cache, pos0)
    finally:
        ops_config.set_backend()
    return np.asarray(logits, np.float32), cache


def test_static_zero_pos():
    assert static_zero_pos(0)
    assert static_zero_pos(np.int32(0))
    assert static_zero_pos(None)
    assert not static_zero_pos(1)
    assert not static_zero_pos(jnp.zeros((), jnp.int32))  # traced/array: dynamic


def test_flash_prefill_matches_einsum(model):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 256)), jnp.int32)
    ref, ref_cache = _prefill_logits(model, ids, flash=False)
    out, out_cache = _prefill_logits(model, ids, flash=True)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    # The cache for the decode continuation matches too (layer 0 is exact;
    # deeper layers inherit the attention paths' float noise).
    for rc, oc in zip(jax.tree_util.tree_leaves(ref_cache), jax.tree_util.tree_leaves(out_cache)):
        np.testing.assert_allclose(np.asarray(rc, np.float32), np.asarray(oc, np.float32), rtol=1e-4, atol=1e-4)


def test_flash_prefill_quantized_cache_close(model):
    """With a quantized KV cache the flash path attends to the RAW k/v (no
    quantize->dequantize error inside the prompt), so it is close to — and
    no further from — the float-cache reference than the einsum path."""
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 512, (1, 256)), jnp.int32)
    truth, _ = _prefill_logits(model, ids, kv_quant=None, flash=False)
    ein, _ = _prefill_logits(model, ids, kv_quant="qint8", flash=False)
    fla, _ = _prefill_logits(model, ids, kv_quant="qint8", flash=True)
    err_ein = np.abs(ein - truth).max()
    err_fla = np.abs(fla - truth).max()
    assert err_fla <= err_ein + 1e-4, (err_fla, err_ein)


def test_flash_prefill_skips_dynamic_offset(model):
    """A traced / nonzero offset must stay on the einsum path (chunked
    prefill correctness)."""
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 512, (1, 256)), jnp.int32)
    # one-chunk reference over 512 tokens is overkill here: just check a
    # nonzero static offset still produces mask-correct logits vs flash off.
    ref, _ = _prefill_logits(model, ids, flash=False, pos0=8)
    out, _ = _prefill_logits(model, ids, flash=True, pos0=8)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_flash_prefill_gemma2_softcap():
    """gemma2 routes softcap + query_pre_attn_scalar scaling through the
    splash kernel's attn_logits_soft_cap; sliding layers with window >= T
    also take the fast path (pure causal at offset 0)."""
    from quanto_tpu.models.gemma2 import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=512, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, sliding_window=512,
        dtype=jnp.float32,
    )
    m = Gemma2ForCausalLM(cfg, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(m)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 512, (1, 256)), jnp.int32)

    def run(flash):
        cache = nnx.merge(graphdef, state).init_kv_cache(1, 264, jnp.float32)
        ops_config.set_backend(flash_prefill=flash)
        try:
            logits, _ = nnx.merge(graphdef, state)(ids, cache, 0)
        finally:
            ops_config.set_backend()
        return np.asarray(logits, np.float32)

    ref, out = run(False), run(True)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
