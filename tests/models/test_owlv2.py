"""OWLv2 NNX implementation vs the Hugging Face torch implementation.

Covers the open-vocabulary detector the torch reference's object-detection
example quantizes (`examples/vision/object-detection/quantize_owl_model.py`):
CLIP text/vision towers, class-token-merged patch grid, class head with
learned shift/scale, box head with grid anchors, objectness head, padded
query masking, and quantization."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import Owlv2Config, Owlv2ForObjectDetection
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config():
    from transformers import Owlv2Config as HFOwlv2Config
    from transformers.models.owlv2 import Owlv2TextConfig, Owlv2VisionConfig

    tc = Owlv2TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        attention_dropout=0.0,
    )
    vc = Owlv2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=24, patch_size=8, num_channels=3,
        attention_dropout=0.0,
    )
    return HFOwlv2Config(text_config=tc.to_dict(), vision_config=vc.to_dict(), projection_dim=32)


def _load_pair():
    import torch
    from transformers import Owlv2ForObjectDetection as HFOwl

    torch.manual_seed(0)
    hf_config = _tiny_hf_config()
    torch_model = HFOwl(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = Owlv2ForObjectDetection(Owlv2Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair()


def _inputs(batch=2, queries=3, seq=6, seed=0):
    rng = np.random.RandomState(seed)
    pixels = rng.randn(batch, 3, 24, 24).astype(np.float32)
    # Query token sequences; the last query of image 1 is padding (id 0).
    ids = rng.randint(1, 64, (batch * queries, seq)).astype(np.int64)
    ids[-1, :] = 0
    mask = (ids > 0).astype(np.int64)
    return pixels, ids, mask


def test_owlv2_detection_matches_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    pixels, ids, mask = _inputs()
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.from_numpy(mask),
        )
    out = model(jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref.pred_boxes.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["objectness_logits"]), ref.objectness_logits.numpy(), rtol=2e-4, atol=2e-4
    )
    # Masked (padded) queries sit at float32 min in both; compare the rest.
    ours_logits = np.asarray(out["logits"])
    ref_logits = ref.logits.numpy()
    valid = ref_logits > np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(valid, np.asarray(ours_logits) > np.finfo(np.float32).min / 2)
    np.testing.assert_allclose(ours_logits[valid], ref_logits[valid], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["text_embeds"]),
        ref.text_embeds.numpy(),
        rtol=2e-4, atol=2e-4,
    )


def test_owlv2_quantized(torch_and_nnx):
    _, model = _load_pair()
    pixels, ids, mask = _inputs(seed=1)
    args = (jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    float_out = model(*args)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "owlv2.vision_model.encoder.layers.0.self_attn.q_proj" in qmap
    assert "class_head.dense0" in qmap
    assert "box_head.dense2" in qmap
    q_out = model(*args)
    for key in ("pred_boxes", "objectness_logits"):
        a = np.asarray(float_out[key]).ravel()
        b = np.asarray(q_out[key]).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, (key, cos)


def test_owlv2_save_reload(tmp_path):
    from quanto_tpu.models import QuantizedTransformersModel

    _, model = _load_pair()
    pixels, ids, mask = _inputs(seed=2)
    args = (jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask))
    qmodel = QuantizedTransformersModel.quantize(model, weights="qint8")
    ref = qmodel(*args)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedTransformersModel.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out = reloaded(*args)
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), np.asarray(ref["pred_boxes"]), rtol=1e-5, atol=1e-5
    )
