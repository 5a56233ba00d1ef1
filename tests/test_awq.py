"""AWQ scale-search recipe (external/awq.py).

Checks: (1) the folds are float no-ops (model function preserved);
(2) the searched scales reduce int4 reconstruction error on the calibration
batch vs no scaling (guaranteed not-worse by construction since alpha=0 is
in the grid; here we assert strict improvement on an outlier-heavy model);
(3) the full pipeline (awq fold -> quantize -> freeze) produces logits at
least as close to float as plain quantization.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.tensor.qtype import qtypes

from external.awq import apply_awq, awq_search_scale, collect_awq_inputs


def _tiny_llama(seed=0):
    config = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return LlamaForCausalLM(config, rngs=nnx.Rngs(seed))


def _inject_outliers(model, mag=30.0):
    """Give a few input channels outsized activations by scaling embedding
    columns — the regime AWQ exists for."""
    emb = model.model.embed_tokens.embedding.get_value()
    cols = np.zeros(emb.shape[1], np.float32)
    cols[:] = 1.0
    cols[::16] = mag
    model.model.embed_tokens.embedding.set_value(emb * jnp.asarray(cols)[None, :])


def test_awq_fold_is_float_noop():
    model = _tiny_llama()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 16)), jnp.int32)
    ref, _ = model(ids)
    inputs = collect_awq_inputs(model, ids)
    alphas = apply_awq(model, inputs, weights="qint4", n_grid=5)
    out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    assert len(alphas) == 6  # 3 fold points x 2 layers


def test_awq_scale_reduces_quant_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 64), jnp.float32)
    # Outlier channels.
    x = x.at[:, ::8].multiply(25.0)
    w = jnp.asarray(rng.randn(128, 64), jnp.float32)
    qt4 = qtypes["qint4"]
    from external.awq import _quant_error

    s, alpha = awq_search_scale(x, [w], qt4, 32, n_grid=11)
    err_awq = float(_quant_error(x, [w], s, qt4, 32))
    err_plain = float(_quant_error(x, [w], jnp.ones(64), qt4, 32))
    assert alpha > 0.0
    assert err_awq < err_plain


def test_awq_pipeline_not_worse_than_plain():
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (2, 16)), jnp.int32)

    def quantized_logits(use_awq):
        model = _tiny_llama()
        _inject_outliers(model)
        ref, _ = model(ids)
        if use_awq:
            inputs = collect_awq_inputs(model, ids)
            apply_awq(model, inputs, weights="qint4", n_grid=11)
        qt.quantize(model, weights="qint4", exclude="lm_head")
        qt.freeze(model)
        out, _ = model(ids)
        return np.asarray(ref, np.float32), np.asarray(out, np.float32)

    ref_p, out_p = quantized_logits(False)
    ref_a, out_a = quantized_logits(True)
    err_plain = np.linalg.norm(out_p - ref_p)
    err_awq = np.linalg.norm(out_a - ref_a)
    # The search metric optimizes per-layer error; end-to-end it must not
    # blow up, and with injected outliers it should genuinely help.
    assert err_awq <= err_plain * 1.05
