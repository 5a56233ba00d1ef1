"""QuantizedModelForCausalLM end-to-end: quantize -> save_pretrained ->
from_pretrained -> identical logits (mirrors the reference
`tests/models/test_quantized_model_for_causal_lm.py:11-73`)."""

import os
import tempfile

import numpy as np
import pytest
import jax.numpy as jnp

from quanto_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    QuantizedModelForCausalLM,
)


def _tiny_hf_config():
    from transformers import LlamaConfig as HFLlamaConfig

    return HFLlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )


@pytest.mark.parametrize("weights", ["qint4", "qint8", "qfloat8_e4m3fn"])
def test_quantized_model_save_load_roundtrip(weights):
    hf_config = _tiny_hf_config()
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    model._hf_config = hf_config
    qmodel = QuantizedModelForCausalLM.quantize(model, weights=weights, exclude="lm_head")
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3]], dtype=np.int64))
    logits, _ = qmodel(ids)

    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        assert os.path.exists(os.path.join(td, "model.safetensors"))
        assert os.path.exists(os.path.join(td, "quanto_qmap.json"))
        assert os.path.exists(os.path.join(td, "config.json"))
        reloaded = QuantizedModelForCausalLM.from_pretrained(td, dtype=jnp.float32)
        logits2, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-5, atol=1e-6)


def test_from_pretrained_requires_qmap():
    with tempfile.TemporaryDirectory() as td:
        with pytest.raises(ValueError, match="quanto_qmap"):
            QuantizedModelForCausalLM.from_pretrained(td)
