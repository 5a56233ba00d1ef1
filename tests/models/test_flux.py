"""Flux diffusion transformer tests: forward shape, quantization accuracy,
and the diffusers-style wrapper round trip (reference
`tests/models/test_quantized_diffusers_model.py` analogue)."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import (
    FluxConfig,
    FluxTransformer2DModel,
    QuantizedFluxTransformer2DModel,
)

from ..helpers import assert_similar


def _tiny_config(guidance=False):
    return FluxConfig(
        patch_size=1, in_channels=16, num_layers=2, num_single_layers=2,
        attention_head_dim=32, num_attention_heads=2, joint_attention_dim=48,
        pooled_projection_dim=24, guidance_embeds=guidance,
        axes_dims_rope=(8, 12, 12), dtype=jnp.float32,
    )


def _inputs(t_img=16, t_txt=6, key=0):
    rng = np.random.RandomState(key)
    latents = jnp.asarray(rng.randn(2, t_img, 16).astype(np.float32))
    context = jnp.asarray(rng.randn(2, t_txt, 48).astype(np.float32))
    pooled = jnp.asarray(rng.randn(2, 24).astype(np.float32))
    t = jnp.asarray([0.5, 0.9], jnp.float32)
    img_ids = jnp.stack(
        [jnp.zeros(t_img), jnp.arange(t_img) // 4, jnp.arange(t_img) % 4], axis=1
    ).astype(jnp.float32)
    txt_ids = jnp.zeros((t_txt, 3), jnp.float32)
    return latents, context, pooled, t, img_ids, txt_ids


def test_flux_forward_shape():
    model = FluxTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    latents, context, pooled, t, img_ids, txt_ids = _inputs()
    out = model(latents, context, pooled, t, img_ids, txt_ids)
    assert out.shape == (2, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flux_guidance_embeds():
    model = FluxTransformer2DModel(_tiny_config(guidance=True), rngs=nnx.Rngs(0))
    latents, context, pooled, t, img_ids, txt_ids = _inputs()
    g = jnp.asarray([3.5, 3.5], jnp.float32)
    out = model(latents, context, pooled, t, img_ids, txt_ids, guidance=g)
    out2 = model(latents, context, pooled, t, img_ids, txt_ids, guidance=g * 2)
    assert out.shape == (2, 16, 16)
    # guidance conditioning must actually flow into the output
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_flux_quantize_int8_close():
    model = FluxTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    inputs = _inputs()
    ref = model(*inputs)
    qt.quantize(model, weights="qint8")
    qmap = qt.quantization_map(model)
    assert "transformer_blocks.0.attn.to_q" in qmap
    assert "transformer_blocks.0.attn.add_q_proj" in qmap
    assert "single_transformer_blocks.0.proj_mlp" in qmap
    assert "time_text_embed.timestep_embedder.linear_1" in qmap
    qt.freeze(model)
    out = model(*inputs)
    assert_similar(out, ref, rtol=5e-2)


def test_flux_wrapper_save_load_roundtrip():
    model = FluxTransformer2DModel(_tiny_config(), rngs=nnx.Rngs(0))
    inputs = _inputs()
    qmodel = QuantizedFluxTransformer2DModel.quantize(model, weights="qint8")
    ref = qmodel(*inputs)
    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        with open(os.path.join(td, "config.json")) as f:
            assert '"_class_name": "FluxTransformer2DModel"' in f.read()
        reloaded = QuantizedFluxTransformer2DModel.from_pretrained(td)
        out = reloaded(*inputs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)
