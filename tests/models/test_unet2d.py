"""UNet2DConditionModel (SD-1.5 class) tests.

No torch diffusers is available in this environment (same situation as
flux/sd3), so coverage is structural: state-dict naming matches the
diffusers layout, forward shapes, conditioning sensitivity, quantization
accuracy (QConv2d + QLinear), and the diffusers-wrapper round trip."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import UNet2DConfig, UNet2DConditionModel
from quanto_tpu.models.loading import hf_state_dict


def _tiny_config(**kw):
    kw.setdefault("sample_size", 8)
    kw.setdefault("in_channels", 4)
    kw.setdefault("out_channels", 4)
    kw.setdefault("down_block_types", ("CrossAttnDownBlock2D", "DownBlock2D"))
    kw.setdefault("up_block_types", ("UpBlock2D", "CrossAttnUpBlock2D"))
    kw.setdefault("block_out_channels", (32, 64))
    kw.setdefault("layers_per_block", 2)
    kw.setdefault("cross_attention_dim", 24)
    kw.setdefault("attention_head_dim", 4)
    kw.setdefault("norm_num_groups", 8)
    return UNet2DConfig(**kw)


def _inputs(batch=2, size=8, ctx_dim=24, seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(batch, 4, size, size).astype(np.float32)
    context = rng.randn(batch, 6, ctx_dim).astype(np.float32)
    return jnp.asarray(sample), jnp.asarray(context)


@pytest.fixture(scope="module")
def model():
    return UNet2DConditionModel(_tiny_config(), rngs=nnx.Rngs(0))


def test_unet_forward_shape(model):
    sample, context = _inputs()
    out = model(sample, 10, context)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_conditioning_sensitivity(model):
    """Timestep and text conditioning both reach the output."""
    sample, context = _inputs()
    base = np.asarray(model(sample, 10, context))
    other_t = np.asarray(model(sample, 500, context))
    other_ctx = np.asarray(model(sample, 10, context + 1.0))
    assert np.abs(base - other_t).max() > 1e-4
    assert np.abs(base - other_ctx).max() > 1e-4


def test_unet_state_dict_matches_diffusers_layout(model):
    sd = hf_state_dict(model)
    expected = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.conv1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "mid_block.resnets.1.conv2.weight",
        "mid_block.attentions.0.transformer_blocks.0.norm3.weight",
        "up_blocks.0.resnets.2.conv1.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.1.attentions.2.proj_out.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]
    for key in expected:
        assert key in sd, key
    # torch conv convention: OIHW.
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    # cross-attn k projects from the text-encoder width.
    assert sd["down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.weight"].shape == (32, 24)
    # up resnet 2 consumes prev(32) + skip from conv_in(32).
    assert sd["up_blocks.1.resnets.2.conv1.weight"].shape[1] == 64


def test_unet_quantized(model):
    m = UNet2DConditionModel(_tiny_config(), rngs=nnx.Rngs(0))
    sample, context = _inputs(seed=1)
    float_out = m(sample, 10, context)
    qt.quantize(m, weights="qint8")
    qt.freeze(m)
    qmap = qt.quantization_map(m)
    assert "conv_in" in qmap  # QConv2d
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q" in qmap
    q_out = m(sample, 10, context)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98


def test_unet_linear_projection_variant():
    """SD-2.x style use_linear_projection=True."""
    m = UNet2DConditionModel(_tiny_config(use_linear_projection=True), rngs=nnx.Rngs(0))
    sample, context = _inputs(seed=2)
    out = m(sample, 3, context)
    assert out.shape == sample.shape
    sd = hf_state_dict(m)
    assert sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2


def test_unet_wrapper_round_trip(tmp_path):
    from quanto_tpu.models import QuantizedUNet2DConditionModel

    m = UNet2DConditionModel(_tiny_config(), rngs=nnx.Rngs(0))
    sample, context = _inputs(seed=3)
    qmodel = QuantizedUNet2DConditionModel.quantize(m, weights="qint8")
    ref = qmodel(sample, 10, context)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedUNet2DConditionModel.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out = reloaded(sample, 10, context)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_unet_wrapper_rejects_wrong_class(tmp_path):
    from quanto_tpu.models import (
        QuantizedPixArtTransformer2DModel,
        QuantizedUNet2DConditionModel,
    )

    m = UNet2DConditionModel(_tiny_config(), rngs=nnx.Rngs(0))
    QuantizedUNet2DConditionModel.quantize(m, weights="qint8").save_pretrained(str(tmp_path))
    with pytest.raises(ValueError, match="does not match"):
        QuantizedPixArtTransformer2DModel.from_pretrained(str(tmp_path))
