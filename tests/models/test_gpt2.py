"""GPT-2 NNX implementation vs the Hugging Face torch implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import GPT2Config, GPT2LMHeadModel
from quanto_tpu.models.loading import load_hf_state_dict

from ..helpers import assert_similar


def _tiny_hf_config():
    from transformers import GPT2Config as HFGPT2Config

    return HFGPT2Config(
        vocab_size=128, n_positions=64, n_embd=48, n_layer=2, n_head=4
    )


@pytest.fixture(scope="module")
def torch_and_nnx():
    import torch
    from transformers import GPT2LMHeadModel as HFGPT2

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFGPT2(hf_config).eval()
    tensors = {
        k: jnp.asarray(v.numpy())
        for k, v in torch_model.state_dict().items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    model = GPT2LMHeadModel(GPT2Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


def test_gpt2_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_gpt2_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_gpt2_quantize_int8(torch_and_nnx):
    """GPT-2 Conv1D projections ARE quantizable here (the torch reference
    cannot quantize Conv1D — this is a capability the TPU build adds)."""
    import torch
    from transformers import GPT2LMHeadModel as HFGPT2

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFGPT2(hf_config).eval()
    tensors = {
        k: jnp.asarray(v.numpy())
        for k, v in torch_model.state_dict().items()
        if not k.endswith(".attn.bias")
    }
    model = GPT2LMHeadModel(GPT2Config.from_hf(hf_config, dtype=jnp.float32))
    load_hf_state_dict(model, tensors)
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    ref, _ = model(ids)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "transformer.h.0.attn.c_attn" in qmap
    out, _ = model(ids)
    assert_similar(out, ref, rtol=2e-2)
