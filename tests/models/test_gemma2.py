"""Gemma-2 NNX implementation vs the Hugging Face torch implementation.

Covers the gemma2-specific mechanisms: alternating sliding/full attention
(with a window smaller than the sequence so the sliding mask actually bites),
attention + final logit softcapping, query_pre_attn_scalar scaling, the
four-norm layer layout, cached decode across the window boundary, and
quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Gemma2Config, Gemma2ForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import Gemma2Config as HFGemma2Config

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("num_hidden_layers", 4)  # 2 sliding + 2 full
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)  # GQA
    kw.setdefault("head_dim", 12)
    kw.setdefault("query_pre_attn_scalar", 12)
    kw.setdefault("sliding_window", 4)  # < seq len below
    kw.setdefault("attn_logit_softcapping", 50.0)
    kw.setdefault("final_logit_softcapping", 30.0)
    return HFGemma2Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Gemma2ForCausalLM as HFGemma2

    torch.manual_seed(0)
    torch_model = HFGemma2(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Gemma2ForCausalLM(Gemma2Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_gemma2_layer_types_alternate():
    cfg = Gemma2Config.from_hf(_tiny_hf_config(), dtype=jnp.float32)
    assert cfg.layer_types == (
        "sliding_attention", "full_attention", "sliding_attention", "full_attention"
    )


def test_gemma2_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    # 8 tokens > sliding_window=4: the sliding layers drop distant keys.
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 64]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_gemma2_sliding_window_bites(torch_and_nnx):
    """The sliding mask must actually change the result vs a full mask."""
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 64]], dtype=np.int64))
    ref, _ = model(ids)
    import dataclasses

    orig = model.config
    model.config = dataclasses.replace(
        orig, layer_types=("full_attention",) * orig.num_hidden_layers
    )
    try:
        full, _ = model(ids)
    finally:
        model.config = orig
    assert np.abs(np.asarray(ref) - np.asarray(full)).max() > 1e-4


def test_gemma2_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 64]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :5], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]), rtol=1e-4, atol=1e-5)
    for t in range(5, 8):  # decode steps cross the window boundary
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_gemma2_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.layers.0.self_attn.q_proj" in qmap
    assert reloaded._wrapped.config.layer_types == model.config.layer_types
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
