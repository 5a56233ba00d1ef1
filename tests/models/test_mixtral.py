"""Mixtral (MoE) NNX implementation vs the Hugging Face torch implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import MixtralConfig, MixtralForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict

from ..helpers import assert_similar


def _tiny_hf_config():
    from transformers import MixtralConfig as HFMixtralConfig

    return HFMixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )


@pytest.fixture(scope="module")
def torch_and_nnx():
    import torch
    from transformers import MixtralForCausalLM as HFMixtral

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFMixtral(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = MixtralForCausalLM(MixtralConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


def test_mixtral_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_mixtral_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-4)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-4)


def test_mixtral_quantize_experts_int8(torch_and_nnx):
    """Per-expert projections (w1/w2/w3) and the router gate quantize through
    the standard module swap."""
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    ref, _ = model(ids)
    qt.quantize(model, weights="qint8", exclude=["lm_head", "*gate"])
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "model.layers.0.block_sparse_moe.experts.0.w1" in qmap
    assert "model.layers.0.block_sparse_moe.gate" not in qmap
    out, _ = model(ids)
    assert_similar(out, ref, rtol=5e-2)


def test_mixtral_tied_embeddings_and_config_roundtrip(tmp_path):
    """tie_word_embeddings is honored, and save_pretrained of a natively
    built MoE model synthesizes a loadable config.json."""
    from quanto_tpu.models import QuantizedModelForCausalLM

    cfg = MixtralConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=2, num_experts_per_tok=1,
        max_position_embeddings=32, tie_word_embeddings=True, dtype=jnp.float32,
    )
    model = MixtralForCausalLM(cfg)
    assert model.lm_head is None
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 4)), jnp.int32)
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="*gate")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    import os
    assert os.path.exists(tmp_path / "config.json")
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
