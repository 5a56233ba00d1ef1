"""Gemma support: our llama-family implementation with unit-offset RMSNorm,
scaled embeddings and GELU MLP vs the Hugging Face torch implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def test_gemma_logits_match_hf():
    import torch
    from transformers import GemmaConfig as HFGemmaConfig
    from transformers import GemmaForCausalLM as HFGemma

    hf_config = HFGemmaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    torch_model = HFGemma(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    config = LlamaConfig.from_hf(hf_config, dtype=jnp.float32)
    assert config.rms_norm_unit_offset and config.scale_embeddings
    assert config.hidden_act == "gelu_pytorch_tanh"
    model = LlamaForCausalLM(config)
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]

    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)
