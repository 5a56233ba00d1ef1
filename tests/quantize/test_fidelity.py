"""Quantization-fidelity regression gates (VERDICT round-1 item #7).

Synthetic-corpus ppl deltas are noise-level on random weights; weight SQNR
and logits-KL are not. These thresholds are calibrated ~20% below the
measured round-2 baselines (RESULTS.md "Quantization fidelity") so a layout
or kernel regression that corrupts codes/scales fails loudly while normal
run-to-run variation passes.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM

sys.path.insert(0, "bench")
from generation.fidelity import logits_fidelity, weight_sqnr_db  # noqa: E402
from generation.perplexity import synthetic_tokens  # noqa: E402


def _model():
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


@pytest.mark.parametrize(
    "weights,group_size_note,min_sqnr",
    [
        ("qint8", "per-channel", 40.0),
        ("qfloat8_e4m3fn", "per-channel", 28.0),
        ("qint4", "g128-auto", 18.0),
        ("qint2", "g128-auto", 5.0),
    ],
)
def test_weight_sqnr_floor(weights, group_size_note, min_sqnr):
    model = _model()
    qt.quantize(model, weights=weights, exclude="lm_head")
    sqnr = weight_sqnr_db(model)
    assert sqnr, "no quantized modules found"
    assert min(sqnr.values()) > min_sqnr, (weights, min(sqnr.values()))


def test_logits_kl_ordering_and_floors():
    """KL vs float must rank by weight precision and stay under per-config
    ceilings; a corrupted layout would blow these up by orders of magnitude."""
    tokens = synthetic_tokens(512, 2048)
    ref = _model()
    kl = {}
    for w in ("qint8", "qfloat8_e4m3fn", "qint4"):
        m = _model()
        qt.quantize(m, weights=w, exclude="lm_head")
        qt.freeze(m)
        kl[w] = logits_fidelity(m, ref, tokens, batch=2, seq=128)
    assert kl["qint8"]["kl"] < kl["qfloat8_e4m3fn"]["kl"] < kl["qint4"]["kl"]
    assert kl["qint8"]["kl"] < 0.01
    assert kl["qint8"]["top1"] > 0.8
    assert kl["qint4"]["kl"] < 0.5


def test_lm_head_quantization_gate():
    """The lm-head-int4 perf adoption (bench.py int4+head4) is gated on
    fidelity, not ppl noise: quantizing the head must not dominate the
    model's KL budget (measured: head-int4 adds a small fraction on top of
    body-int4)."""
    tokens = synthetic_tokens(512, 2048)
    ref = _model()
    body = _model()
    qt.quantize(body, weights="qint4", exclude="lm_head")
    qt.freeze(body)
    full = _model()
    qt.quantize(full, weights="qint4")
    qt.freeze(full)
    kl_body = logits_fidelity(body, ref, tokens, batch=2, seq=128)["kl"]
    kl_full = logits_fidelity(full, ref, tokens, batch=2, seq=128)["kl"]
    assert kl_full < 3.0 * max(kl_body, 1e-4), (kl_body, kl_full)
