"""Qwen3 (dense + MoE) NNX implementations vs the Hugging Face torch ones.

Covers the per-head QK-norm before rope, explicit head_dim, the MoE block
without shared expert (norm_topk_prob=True), cached decode, and
quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import (
    Qwen3Config,
    Qwen3ForCausalLM,
    Qwen3MoeConfig,
    Qwen3MoeForCausalLM,
)
from quanto_tpu.models.loading import load_hf_state_dict

IDS = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)


def _tiny_hf_config(**kw):
    from transformers import Qwen3Config as HFQwen3Config

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    kw.setdefault("head_dim", 16)  # decoupled from hidden/heads (48/4 != 16)
    return HFQwen3Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Qwen3ForCausalLM as HFQwen3

    torch.manual_seed(0)
    torch_model = HFQwen3(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Qwen3ForCausalLM(Qwen3Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_qwen3_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(IDS)).logits.numpy()
    ours, _ = model(jnp.asarray(IDS))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen3_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_qwen3_moe_logits_match_hf():
    import torch
    from transformers import Qwen3MoeConfig as HFQwen3MoeConfig
    from transformers import Qwen3MoeForCausalLM as HFQwen3Moe

    hf_config = HFQwen3MoeConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32,
    )
    torch.manual_seed(0)
    torch_model = HFQwen3Moe(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Qwen3MoeForCausalLM(Qwen3MoeConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(IDS)).logits.numpy()
    ours, _ = model(jnp.asarray(IDS))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_qwen3_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.layers.0.self_attn.q_proj" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_qwen3_yarn_rope_matches_hf():
    """Qwen3 long-context checkpoints ship yarn rope_scaling; logits must
    match HF with it active."""
    import torch
    from transformers import Qwen3ForCausalLM as HFQwen3

    hf_config = _tiny_hf_config(
        max_position_embeddings=128,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32},
    )
    torch.manual_seed(0)
    torch_model = HFQwen3(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Qwen3ForCausalLM(Qwen3Config.from_hf(hf_config, dtype=jnp.float32))
    assert model.config.rope_scaling is not None
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == []
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
