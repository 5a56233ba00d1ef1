"""ViT NNX implementation vs the Hugging Face torch implementation.

Covers the image-classification architecture the torch reference's vision
example quantizes (`examples/vision/image-classification/pets/
quantize_vit_model.py`): conv patch embedding, CLS token, pre-norm encoder,
quantization (Linear + the patch-projection Conv) and save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import ViTConfig, ViTForImageClassification
from quanto_tpu.models.loading import hf_state_dict, load_hf_state_dict


def _tiny_hf_config():
    from transformers import ViTConfig as HFViTConfig

    return HFViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=24, patch_size=8, num_channels=3,
        id2label={0: "cat", 1: "dog", 2: "bird"},
    )


def _load_pair():
    import torch
    from transformers import ViTForImageClassification as HFViT

    torch.manual_seed(0)
    hf_config = _tiny_hf_config()
    torch_model = HFViT(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = ViTForImageClassification(ViTConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair()


def _pixels(batch=2, size=24, seed=0):
    return np.random.RandomState(seed).randn(batch, 3, size, size).astype(np.float32)


def test_vit_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    pixels = _pixels()
    with torch.no_grad():
        ref = torch_model(pixel_values=torch.from_numpy(pixels)).logits.numpy()
    ours = model(jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_vit_quantized(torch_and_nnx):
    _, model = _load_pair()
    pixels = jnp.asarray(_pixels(seed=1))
    float_out = model(pixels)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "vit.encoder.layer.0.attention.attention.query" in qmap
    # The conv patch projection quantizes too (QConv2d; the reference's ViT
    # example quantizes it the same way).
    assert "vit.embeddings.patch_embeddings.projection" in qmap
    q_out = model(pixels)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


def test_vit_calibrated_activations(torch_and_nnx):
    _, model = _load_pair()
    pixels = jnp.asarray(_pixels(seed=2))
    float_out = model(pixels)
    qt.quantize(model, weights="qint8", activations="qint8")
    with qt.Calibration(model):
        model(pixels)
    qt.freeze(model)
    q_out = model(pixels)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95


def test_vit_quantize_save_reload(tmp_path):
    from quanto_tpu.models import QuantizedTransformersModel

    _, model = _load_pair()
    pixels = jnp.asarray(_pixels(seed=3))
    qmodel = QuantizedTransformersModel.quantize(model, weights="qint8")
    ref = qmodel(pixels)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedTransformersModel.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out = reloaded(pixels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_vit_state_dict_round_trip(torch_and_nnx):
    import torch
    from transformers import ViTForImageClassification as HFViT

    _, model = torch_and_nnx
    # Export our float model back to torch convention and load it into HF.
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in hf_state_dict(model).items()}
    torch_model = HFViT(_tiny_hf_config()).eval()
    torch_model.load_state_dict(sd)
    pixels = _pixels(seed=4)
    with torch.no_grad():
        ref = torch_model(pixel_values=torch.from_numpy(pixels)).logits.numpy()
    ours = model(jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
