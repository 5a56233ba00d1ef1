"""PixArt diffusion transformer tests (reference
`tests/models/test_quantized_diffusers_model.py` analogue): forward shape,
quantization accuracy, and save/load round trip through the diffusers-style
wrapper."""

import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import (
    PixArtConfig,
    PixArtTransformer2DModel,
    QuantizedPixArtTransformer2DModel,
)

from ..helpers import assert_similar


def _tiny_config():
    # Note: in real PixArt checkpoints cross_attention_dim == inner_dim
    # (16 heads x 72 = 1152); the tiny config preserves that invariant.
    return PixArtConfig(
        sample_size=8, patch_size=2, in_channels=4, out_channels=8,
        num_layers=2, num_attention_heads=2, attention_head_dim=16,
        cross_attention_dim=32, caption_channels=64, dtype=jnp.float32,
    )


def _inputs(key=0):
    rng = np.random.RandomState(key)
    latent = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([10.0, 500.0], jnp.float32)
    captions = jnp.asarray(rng.randn(2, 6, 64).astype(np.float32))
    return latent, t, captions


def test_pixart_forward_shape():
    model = PixArtTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    latent, t, captions = _inputs()
    out = model(latent, t, captions)
    assert out.shape == (2, 8, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pixart_quantize_int8_close():
    model = PixArtTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    latent, t, captions = _inputs()
    ref = model(latent, t, captions)
    qt.quantize(model, weights="qint8")
    qmap = qt.quantization_map(model)
    assert "transformer_blocks.0.attn1.to_q" in qmap
    assert "transformer_blocks.0.ff.net.0.proj" in qmap
    qt.freeze(model)
    out = model(latent, t, captions)
    assert_similar(out, ref, rtol=5e-2)


def test_pixart_wrapper_save_load_roundtrip():
    model = PixArtTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    latent, t, captions = _inputs()
    qmodel = QuantizedPixArtTransformer2DModel.quantize(model, weights="qint8")
    ref = qmodel(latent, t, captions)
    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        with open(os.path.join(td, "config.json")) as f:
            assert '"_class_name": "PixArtTransformer2DModel"' in f.read()
        reloaded = QuantizedPixArtTransformer2DModel.from_pretrained(td)
        out = reloaded(latent, t, captions)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_pixart_wrapper_rejects_wrong_class():
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "quanto_qmap.json"), "w") as f:
            f.write("{}")
        with open(os.path.join(td, "config.json"), "w") as f:
            f.write('{"_class_name": "FluxTransformer2DModel"}')
        with pytest.raises(ValueError, match="does not match"):
            QuantizedPixArtTransformer2DModel.from_pretrained(td)
