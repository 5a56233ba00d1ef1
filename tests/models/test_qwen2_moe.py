"""Qwen2-MoE NNX implementation vs the Hugging Face torch implementation,
plus the qkv-bias fix for dense Qwen2."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Qwen2MoeConfig, Qwen2MoeForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict

from ..helpers import assert_similar


def _tiny_hf_config(**kw):
    from transformers import Qwen2MoeConfig as HFConfig

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("moe_intermediate_size", 48)
    kw.setdefault("shared_expert_intermediate_size", 80)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    kw.setdefault("num_experts", 4)
    kw.setdefault("num_experts_per_tok", 2)
    kw.setdefault("max_position_embeddings", 64)
    kw.setdefault("tie_word_embeddings", False)
    return HFConfig(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Qwen2MoeForCausalLM as HFQwen2Moe

    torch.manual_seed(0)
    torch_model = HFQwen2Moe(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Qwen2MoeForCausalLM(Qwen2MoeConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


def test_qwen2_moe_logits_match_hf():
    import torch

    torch_model, model = _load_pair(_tiny_hf_config())
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_qwen2_moe_sparse_step_and_norm_topk():
    """Dense layers via decoder_sparse_step; normalized top-k probs."""
    import torch

    torch_model, model = _load_pair(
        _tiny_hf_config(decoder_sparse_step=2, norm_topk_prob=True)
    )
    # layer 0 dense (1 % 2 != 0), layer 1 MoE
    from quanto_tpu.models.llama import LlamaMLP
    from quanto_tpu.models.qwen2_moe import Qwen2MoeSparseBlock

    assert isinstance(model.model.layers[0].mlp, LlamaMLP)
    assert isinstance(model.model.layers[1].mlp, Qwen2MoeSparseBlock)
    ids = np.array([[4, 9, 2, 77]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_qwen2_moe_kv_cache_and_quantize():
    _, model = _load_pair(_tiny_hf_config())
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-4)
    step, cache = model(ids[:, 4:5], cache, 4)
    np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, 4]), rtol=1e-4, atol=1e-4)

    ref, _ = model(ids)
    qt.quantize(model, weights="qint8", exclude=["lm_head", "*gate", "*shared_expert_gate"])
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "model.layers.0.mlp.experts.0.gate_proj" in qmap
    assert "model.layers.0.mlp.shared_expert.up_proj" in qmap
    assert "model.layers.0.mlp.gate" not in qmap
    out, _ = model(ids)
    assert_similar(out, ref, rtol=5e-2)


def test_dense_qwen2_qkv_bias_matches_hf():
    """Dense Qwen2 has bias on q/k/v only — regression test for the
    qkv_bias wiring in the llama family."""
    import torch
    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM as HFQwen2

    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM

    hf_config = HFQwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    torch_model = HFQwen2(hf_config).eval()
    sd = torch_model.state_dict()
    assert "model.layers.0.self_attn.q_proj.bias" in sd  # qkv bias exists
    tensors = {k: jnp.asarray(v.numpy()) for k, v in sd.items()}
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert not any("bias" in k for k in report["unexpected"]), report["unexpected"]
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
