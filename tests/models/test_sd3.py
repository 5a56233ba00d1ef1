"""SD3 (joint-attention MMDiT) tests: forward shape, quantization accuracy,
and the diffusers-style wrapper round trip."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import (
    QuantizedSD3Transformer2DModel,
    SD3Config,
    SD3Transformer2DModel,
)

from ..helpers import assert_similar


def _tiny_config(qk_norm=None):
    return SD3Config(
        sample_size=8, patch_size=2, in_channels=4, out_channels=4,
        num_layers=2, attention_head_dim=16, num_attention_heads=2,
        joint_attention_dim=48, caption_projection_dim=32,
        pooled_projection_dim=24, pos_embed_max_size=12, qk_norm=qk_norm,
        dtype=jnp.float32,
    )


def _inputs(key=0):
    rng = np.random.RandomState(key)
    latent = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    context = jnp.asarray(rng.randn(2, 6, 48).astype(np.float32))
    pooled = jnp.asarray(rng.randn(2, 24).astype(np.float32))
    t = jnp.asarray([10.0, 500.0], jnp.float32)
    return latent, context, pooled, t


def test_sd3_forward_shape():
    model = SD3Transformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    out = model(*_inputs())
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sd3_qk_norm_variant():
    model = SD3Transformer2DModel(_tiny_config(qk_norm="rms_norm"), rngs=nnx.Rngs(0))
    out = model(*_inputs())
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sd3_quantize_int8_close():
    model = SD3Transformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    inputs = _inputs()
    ref = model(*inputs)
    qt.quantize(model, weights="qint8")
    qmap = qt.quantization_map(model)
    assert "transformer_blocks.0.attn.to_q" in qmap
    assert "transformer_blocks.0.attn.add_q_proj" in qmap
    assert "context_embedder" in qmap
    # Last block is context_pre_only: it must not have to_add_out/ff_context
    assert "transformer_blocks.1.attn.to_add_out" not in qmap
    qt.freeze(model)
    out = model(*inputs)
    assert_similar(out, ref, rtol=5e-2)


def test_sd3_wrapper_save_load_roundtrip():
    model = SD3Transformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    inputs = _inputs()
    qmodel = QuantizedSD3Transformer2DModel.quantize(model, weights="qint8")
    ref = qmodel(*inputs)
    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        with open(os.path.join(td, "config.json")) as f:
            assert '"_class_name": "SD3Transformer2DModel"' in f.read()
        reloaded = QuantizedSD3Transformer2DModel.from_pretrained(td)
        out = reloaded(*inputs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)
