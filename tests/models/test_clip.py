"""CLIP NNX implementation vs the Hugging Face torch one.

Covers both towers (causal text with eot pooling, ViT vision with class
token and pre/post layernorms), the joint projections and contrastive
logits, the non-legacy eos pooling rule, and quantization."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import CLIPConfig, CLIPModel
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(eos_token_id=2, hidden_act="quick_gelu"):
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers.models.clip import CLIPTextConfig, CLIPVisionConfig

    tc = CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        attention_dropout=0.0, eos_token_id=eos_token_id, hidden_act=hidden_act,
    )
    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=24, patch_size=8, num_channels=3,
        attention_dropout=0.0, hidden_act=hidden_act,
    )
    return HFCLIPConfig(text_config=tc.to_dict(), vision_config=vc.to_dict(), projection_dim=32)


def _load_pair(hf_config=None):
    import torch
    from transformers import CLIPModel as HFCLIP

    torch.manual_seed(0)
    hf_config = hf_config or _tiny_hf_config()
    torch_model = HFCLIP(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = CLIPModel(CLIPConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair()


def _inputs(batch=2, seq=6, seed=0):
    rng = np.random.RandomState(seed)
    pixels = rng.randn(batch, 3, 24, 24).astype(np.float32)
    ids = rng.randint(3, 64, (batch, seq)).astype(np.int64)
    return pixels, ids


def test_clip_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    pixels, ids = _inputs()
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pixels)
        )
    lpi, lpt, te, ie = model(jnp.asarray(ids), jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(lpi), ref.logits_per_image.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lpt), ref.logits_per_text.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(te), ref.text_embeds.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ie), ref.image_embeds.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_feature_extractors_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    pixels, ids = _inputs(seed=1)
    with torch.no_grad():
        tref = torch_model.get_text_features(torch.from_numpy(ids)).numpy()
        iref = torch_model.get_image_features(torch.from_numpy(pixels)).numpy()
    np.testing.assert_allclose(
        np.asarray(model.get_text_features(jnp.asarray(ids))), tref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(model.get_image_features(jnp.asarray(pixels))), iref, rtol=1e-4, atol=1e-5
    )


def test_clip_non_legacy_eos_pooling():
    """eos_token_id != 2 pools at the FIRST eos position, not argmax."""
    import torch

    torch_model, model = _load_pair(_tiny_hf_config(eos_token_id=5))
    rng = np.random.RandomState(2)
    ids = rng.randint(6, 64, (2, 6)).astype(np.int64)
    ids[0, 3] = 5  # eos mid-sequence
    ids[1, 5] = 5
    with torch.no_grad():
        ref = torch_model.get_text_features(torch.from_numpy(ids)).numpy()
    ours = model.get_text_features(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_clip_gelu_activation_variant():
    """Larger CLIP checkpoints use plain gelu towers."""
    import torch

    torch_model, model = _load_pair(_tiny_hf_config(hidden_act="gelu"))
    pixels, ids = _inputs(seed=3)
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pixels)
        ).logits_per_text.numpy()
    _, lpt, _, _ = model(jnp.asarray(ids), jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(lpt), ref, rtol=1e-4, atol=1e-4)


def test_clip_quantize(torch_and_nnx):
    _, model = torch_and_nnx
    pixels, ids = _inputs()
    ref_lpt = model(jnp.asarray(ids), jnp.asarray(pixels))[1]
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "text_model.encoder.layers.0.self_attn.q_proj" in qmap
    assert "visual_projection" in qmap
    lpt = model(jnp.asarray(ids), jnp.asarray(pixels))[1]
    cos = np.sum(np.asarray(lpt) * np.asarray(ref_lpt)) / (
        np.linalg.norm(lpt) * np.linalg.norm(ref_lpt)
    )
    assert cos > 0.99
