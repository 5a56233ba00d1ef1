"""SmoothQuant recipe test: smoothing preserves the float model output
exactly (up to rounding) for every supported family — llama, OPT, BLOOM —
the same set the torch reference folds (`external/smoothquant/smoothquant.py`)."""

import sys

import numpy as np
import jax.numpy as jnp
from flax import nnx
import pytest

from quanto_tpu.models import (
    BloomConfig,
    BloomForCausalLM,
    LlamaConfig,
    LlamaForCausalLM,
    OPTConfig,
    OPTForCausalLM,
)

sys.path.insert(0, "/root/repo")
from external.smoothquant import collect_act_scales, smooth_lm  # noqa: E402


def _llama():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0)), "model.layers.0.self_attn"


def _opt():
    cfg = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64, dtype=jnp.float32,
    )
    return OPTForCausalLM(cfg, rngs=nnx.Rngs(0)), "model.decoder.layers.0.self_attn"


def _bloom():
    cfg = BloomConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, dtype=jnp.float32,
    )
    return BloomForCausalLM(cfg, rngs=nnx.Rngs(0)), "transformer.h.0.self_attention"


@pytest.mark.parametrize("family", [_llama, _opt, _bloom])
def test_smoothquant_preserves_float_output(family):
    model, expected_key = family()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 12)), jnp.int32)
    ref, _ = model(ids)
    stats = collect_act_scales(model, ids)
    assert expected_key in stats
    smooth_lm(model, stats, alpha=0.5)
    out, _ = model(ids)
    # Scale folding is numerically exact up to float rounding.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_smoothquant_reduces_w8a8_error_on_outliers():
    """Inject a per-channel activation outlier (llama-style) and check W8A8
    quantization error shrinks after smoothing — the recipe's raison d'être."""
    import quanto_tpu as qt

    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 16)), jnp.int32)

    def build():
        model, _ = _llama()
        # Make one embedding channel an outlier so activations are skewed.
        emb = model.model.embed_tokens.embedding.get_value()
        model.model.embed_tokens.embedding.set_value(emb.at[:, 3].mul(30.0))
        return model

    def w8a8_error(model, smooth):
        ref, _ = model(ids)
        if smooth:
            stats = collect_act_scales(model, ids)
            smooth_lm(model, stats, alpha=0.5)
        qt.quantize(model, weights="qint8", activations="qint8")
        with qt.Calibration(model):
            model(ids)
        qt.freeze(model)
        out, _ = model(ids)
        return float(jnp.mean(jnp.abs(out - ref)))

    err_plain = w8a8_error(build(), smooth=False)
    err_smooth = w8a8_error(build(), smooth=True)
    assert err_smooth <= err_plain * 1.05, (err_plain, err_smooth)
