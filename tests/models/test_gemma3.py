"""Gemma-3 (text) NNX implementation vs the Hugging Face torch one.

Covers the QK-norms (before rope), the dual rope tables (local base freq on
sliding layers, scaled global theta on full-attention layers), the 5:1
sliding pattern, cached decode, and quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Gemma3TextConfig, Gemma3ForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict

IDS = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)


def _tiny_hf_config(**kw):
    from transformers import Gemma3TextConfig as HFGemma3TextConfig

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("num_hidden_layers", 4)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    kw.setdefault("head_dim", 16)
    kw.setdefault("sliding_window", 3)  # exercise the window at T=6
    kw.setdefault("sliding_window_pattern", 2)  # layers 0,2 sliding; 1,3 full
    kw.setdefault("rope_scaling", {"rope_type": "linear", "factor": 4.0})
    kw.setdefault("attn_implementation", "eager")
    return HFGemma3TextConfig(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Gemma3ForCausalLM as HFGemma3

    torch.manual_seed(0)
    torch_model = HFGemma3(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Gemma3ForCausalLM(Gemma3TextConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    # Tied lm_head.weight is emitted by HF but our tied head reads the
    # embedding directly.
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_gemma3_layer_types_pattern():
    c = Gemma3TextConfig(num_hidden_layers=6, sliding_window_pattern=3)
    assert c.layer_types == (
        "sliding_attention", "sliding_attention", "full_attention",
        "sliding_attention", "sliding_attention", "full_attention",
    )


def test_gemma3_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(IDS)).logits.numpy()
    ours, _ = model(jnp.asarray(IDS))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_gemma3_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_gemma3_quantize_save_reload(tmp_path, torch_and_nnx):
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
