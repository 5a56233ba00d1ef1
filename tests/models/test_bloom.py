"""BLOOM NNX implementation vs the Hugging Face torch implementation.

Covers the ALiBi-attention architecture the torch reference's SmoothQuant
recipe folds (`external/smoothquant/smoothquant.py:10`): fused
query_key_value projection, word-embedding layernorm, ALiBi biases (dense
and ragged masks), cached decode and quantization."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import BloomConfig, BloomForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import BloomConfig as HFBloomConfig

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("n_layer", 2)
    # 6 heads exercises the non-power-of-2 ALiBi slope extension.
    kw.setdefault("n_head", 6)
    return HFBloomConfig(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import BloomForCausalLM as HFBloom

    torch.manual_seed(0)
    torch_model = HFBloom(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = BloomForCausalLM(BloomConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_bloom_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_bloom_ragged_mask_matches_hf(torch_and_nnx):
    """Left-padded batch: the ALiBi cumsum form and mask must match HF."""
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99], [0, 0, 3, 42]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1], [0, 0, 1, 1]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).logits.numpy()
    ours, _ = model(jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    # Compare only non-padded positions (HF's padded outputs are arbitrary).
    np.testing.assert_allclose(np.asarray(ours)[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours)[1, 2:], ref[1, 2:], rtol=2e-4, atol=2e-4)


def test_bloom_non_pow2_alibi_slopes():
    from quanto_tpu.models.bloom import alibi_slopes

    import torch
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    for h in (4, 6, 8, 12):
        mask = torch.ones(1, 5)
        ref = build_alibi_tensor(mask, h, torch.float32).numpy().reshape(h, 5)
        ours = np.asarray(alibi_slopes(h))[:, None] * np.arange(5)[None, :]
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_bloom_kv_cache(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64))
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_bloom_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "transformer.h.0.self_attention.query_key_value" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
