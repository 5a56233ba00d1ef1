"""Fidelity validation of the advanced quantization recipes (VERDICT r2 #7).

The reference asserts HQQ beats Max on weight error
(`/root/reference/tests/tensor/weights/optimizers/test_hqq_optimizer.py`);
these tests raise that bar to the logits level for all three recipes: AWQ
scale search, HQQ, and SmoothQuant must each improve (or measurably not
hurt) logits-KL vs the float model compared to plain quantization of the
SAME model. Outlier channels are injected so the recipes' target regime is
actually present (on pure random weights they are no-ops by design).
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.tensor.optimizers import HqqOptimizer

sys.path.insert(0, "bench")
from generation.fidelity import logits_fidelity, weight_sqnr_db  # noqa: E402
from generation.perplexity import synthetic_tokens  # noqa: E402


TOKENS = synthetic_tokens(512, 2048)


def _model(seed=0, outliers=0.0):
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))
    if outliers:
        emb = model.model.embed_tokens.embedding.get_value()
        cols = np.ones(emb.shape[1], np.float32)
        cols[::16] = outliers
        model.model.embed_tokens.embedding.set_value(emb * jnp.asarray(cols)[None, :])
    return model


def _kl(model_q, outliers=0.0):
    return logits_fidelity(model_q, _model(outliers=outliers), TOKENS, batch=2, seq=128)["kl"]


def test_hqq_kl_not_worse_than_max():
    """HQQ shift refinement must not hurt logits fidelity at int4 (and its
    weight SQNR must match-or-beat Max, the reference's error claim)."""
    plain = _model()
    qt.quantize(plain, weights="qint4", exclude="lm_head")
    hqq = _model()
    qt.quantize(hqq, weights="qint4", optimizer=HqqOptimizer(iters=10), exclude="lm_head")

    sqnr_plain = weight_sqnr_db(plain)
    sqnr_hqq = weight_sqnr_db(hqq)
    # Per-layer mean SQNR: HQQ optimizes exactly this (lp-norm weight error).
    assert np.mean(list(sqnr_hqq.values())) >= np.mean(list(sqnr_plain.values())) - 0.1

    qt.freeze(plain)
    qt.freeze(hqq)
    kl_plain, kl_hqq = _kl(plain), _kl(hqq)
    assert kl_hqq <= kl_plain * 1.10, (kl_plain, kl_hqq)


def test_awq_kl_not_worse_than_plain_int4():
    from external.awq import apply_awq, collect_awq_inputs

    ids = jnp.asarray(np.random.RandomState(3).randint(0, 512, (2, 64)), jnp.int32)

    def build(use_awq):
        model = _model(outliers=30.0)
        if use_awq:
            inputs = collect_awq_inputs(model, ids)
            apply_awq(model, inputs, weights="qint4", n_grid=11)
        qt.quantize(model, weights="qint4", exclude="lm_head")
        qt.freeze(model)
        return model

    kl_plain = _kl(build(False), outliers=30.0)
    kl_awq = _kl(build(True), outliers=30.0)
    # With injected outlier channels AWQ should genuinely help; gate on
    # not-worse with margin to stay robust to seed noise.
    assert kl_awq <= kl_plain * 1.05, (kl_plain, kl_awq)


def test_smoothquant_kl_not_worse_than_plain_w8a8():
    from external.smoothquant import collect_act_scales, smooth_lm

    ids = jnp.asarray(np.random.RandomState(4).randint(0, 512, (2, 64)), jnp.int32)

    def build(smooth):
        model = _model(outliers=30.0)
        if smooth:
            stats = collect_act_scales(model, ids)
            smooth_lm(model, stats, alpha=0.5)
        qt.quantize(model, weights="qint8", activations="qint8", exclude="lm_head")
        with qt.Calibration(model):
            model(ids)
        qt.freeze(model)
        return model

    kl_plain = _kl(build(False), outliers=30.0)
    kl_smooth = _kl(build(True), outliers=30.0)
    assert kl_smooth <= kl_plain * 1.05, (kl_plain, kl_smooth)
