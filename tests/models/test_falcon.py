"""Falcon NNX implementation vs the Hugging Face torch implementation.

Covers all three structural variants behind FalconConfig: the Falcon-7B
default (multi-query + parallel attention + rotary), the Falcon-40B
new_decoder_architecture (grouped qkv + dual layernorms), and the
falcon-rw style (ALiBi + sequential residual + per-head interleaved qkv,
with Falcon's alibi-before-scaling order), plus cached decode and
quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import FalconConfig, FalconForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import FalconConfig as HFFalconConfig

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    return HFFalconConfig(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import FalconForCausalLM as HFFalcon

    torch.manual_seed(0)
    torch_model = HFFalcon(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = FalconForCausalLM(FalconConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


def _check_logits(torch_model, model, ids):
    import torch

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


IDS = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)


@pytest.fixture(scope="module")
def falcon7b_style():
    return _load_pair(_tiny_hf_config())  # multi_query + parallel_attn + rope


def test_falcon_7b_style_logits(falcon7b_style):
    _check_logits(*falcon7b_style, IDS)


def test_falcon_new_decoder_architecture_logits():
    pair = _load_pair(
        _tiny_hf_config(new_decoder_architecture=True, num_kv_heads=2)
    )
    _check_logits(*pair, IDS)


def test_falcon_rw_alibi_logits():
    pair = _load_pair(
        _tiny_hf_config(alibi=True, multi_query=False, parallel_attn=False, bias=True)
    )
    _check_logits(*pair, IDS)


def test_falcon_kv_cache(falcon7b_style):
    _, model = falcon7b_style
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_falcon_alibi_kv_cache():
    _, model = _load_pair(
        _tiny_hf_config(alibi=True, multi_query=False, parallel_attn=False, bias=True)
    )
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    step, cache = model(ids[:, 4:5], cache, 4)
    np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, 4]), rtol=1e-4, atol=1e-5)


def test_falcon_quantize_save_reload(tmp_path, falcon7b_style):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = falcon7b_style
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "transformer.h.0.self_attention.query_key_value" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
