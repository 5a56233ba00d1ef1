"""StarCoder2 NNX implementation vs the Hugging Face torch implementation.

Covers the LayerNorm-based llama layout, the ungated c_fc/c_proj MLP with
gelu_pytorch_tanh, biased projections, sliding window, cached decode, and
quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Starcoder2Config, Starcoder2ForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import Starcoder2Config as HFStarcoder2Config

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    return HFStarcoder2Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Starcoder2ForCausalLM as HFStarcoder2

    torch.manual_seed(0)
    torch_model = HFStarcoder2(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Starcoder2ForCausalLM(Starcoder2Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_starcoder2_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_starcoder2_sliding_window_matches_hf():
    import torch

    hf_config = _tiny_hf_config(sliding_window=3)
    torch_model, model = _load_pair(hf_config)
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 64]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_starcoder2_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_starcoder2_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.layers.0.mlp.c_fc" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
