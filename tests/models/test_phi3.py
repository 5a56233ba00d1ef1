"""Phi-3 NNX implementation vs the Hugging Face torch implementation.

Covers the fused qkv_proj block layout (q | k | v stacked, GQA), the fused
gate_up_proj chunked MLP, partial rotary embeddings, the all-layer sliding
window, cached decode, and quantize/save/reload (one quantized matmul per
fused projection)."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Phi3Config, Phi3ForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import Phi3Config as HFPhi3Config

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)  # GQA through the fused qkv
    kw.setdefault("pad_token_id", 0)  # HF default 32000 exceeds the tiny vocab
    return HFPhi3Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import Phi3ForCausalLM as HFPhi3

    torch.manual_seed(0)
    torch_model = HFPhi3(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Phi3ForCausalLM(Phi3Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_phi3_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_phi3_partial_rotary_matches_hf():
    import torch
    from transformers import Phi3ForCausalLM as HFPhi3

    hf_config = _tiny_hf_config(partial_rotary_factor=0.5)
    torch_model, model = _load_pair(hf_config)
    ids = np.array([[2, 9, 31, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_phi3_sliding_window_matches_hf():
    import torch

    hf_config = _tiny_hf_config(sliding_window=3)
    torch_model, model = _load_pair(hf_config)
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 64]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_phi3_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_phi3_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.layers.0.self_attn.qkv_proj" in qmap
    assert "model.layers.0.mlp.gate_up_proj" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _longrope_config(orig=4, maxpos=64):
    # rotary_dim/2 = 6 per-dim factors (head_dim 12, full rotary)
    rng = np.random.RandomState(7)
    short = (1.0 + rng.rand(6) * 0.2).round(3).tolist()
    long = (1.0 + rng.rand(6) * 6.0).round(3).tolist()
    return _tiny_hf_config(
        max_position_embeddings=maxpos,
        original_max_position_embeddings=orig,
        rope_scaling={"type": "longrope", "short_factor": short, "long_factor": long},
    )


def test_phi3_longrope_long_regime_matches_hf():
    """Sequence longer than original_max_position_embeddings -> long_factor
    tables + sqrt(1 + log(f)/log(orig)) attention scaling (Phi-3-*-128k)."""
    import torch

    torch_model, model = _load_pair(_longrope_config(orig=4))
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64)  # 8 > 4
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_phi3_longrope_short_regime_matches_hf():
    """Sequence within the original window -> short_factor tables (HF picks
    per actual length; ours is a traced select so one program serves both)."""
    import torch

    torch_model, model = _load_pair(_longrope_config(orig=16))
    ids = np.array([[1, 5, 17, 99, 3]], dtype=np.int64)  # 5 <= 16
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_phi3_longrope_cached_decode_matches_full():
    _, model = _load_pair(_longrope_config(orig=4))
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 16, jnp.float32)
    logits, cache = model(ids[:, :5], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]), rtol=1e-4, atol=1e-5)
    for t in range(5, 8):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_phi3_longrope_save_reload(tmp_path):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = _load_pair(_longrope_config(orig=4))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert reloaded.config.rope_scaling == qmodel._wrapped.config.rope_scaling
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
