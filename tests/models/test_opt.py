"""OPT NNX implementation vs the Hugging Face torch implementation.

OPT is the torch reference's end-to-end test model
(`tests/models/test_quantized_model_for_causal_lm.py:11-73`), so this file
also replicates that test's shape: quantize → save → reload → logits match.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import OPTConfig, OPTForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict

from ..helpers import assert_similar


def _tiny_hf_config(**kw):
    from transformers import OPTConfig as HFOPTConfig

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("ffn_dim", 96)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("max_position_embeddings", 64)
    return HFOPTConfig(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import OPTForCausalLM as HFOPT

    torch.manual_seed(0)
    torch_model = HFOPT(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = OPTForCausalLM(OPTConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_opt_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_opt_projected_embeddings_match_hf():
    """opt-350m-style word_embed_proj_dim != hidden_size."""
    import torch

    torch_model, model = _load_pair(_tiny_hf_config(word_embed_proj_dim=32))
    ids = np.array([[4, 9, 2, 77]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_opt_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_opt_quantize_save_reload(tmp_path, torch_and_nnx):
    """The reference's OPT end-to-end shape: quantize → save_pretrained →
    from_pretrained → logits equality."""
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="lm_head")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.decoder.layers.0.self_attn.q_proj" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
