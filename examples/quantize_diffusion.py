"""Quantize a diffusion transformer (Flux / SD3 / PixArt) and run a
denoising step — the diffusers-side workflow of the torch reference
(`optimum/quanto/models/diffusers_models.py`), TPU-native.

Usage:
    python examples/quantize_diffusion.py [--weights qint8] [--family flux|sd3|pixart]

Without a checkpoint directory this builds a small randomly-initialized
model (architecture and state-dict layout identical to the real ones); pass
--model DIR to load a local diffusers checkpoint converted to safetensors.
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["flux", "sd3", "pixart", "unet"], default="flux")
    p.add_argument("--weights", default="qint8",
                   choices=["qint4", "qint8", "qfloat8_e4m3fn"])
    p.add_argument("--model", default=None, help="local diffusers checkpoint dir")
    args = p.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    from quanto_tpu.models import (
        FluxConfig, FluxTransformer2DModel, QuantizedFluxTransformer2DModel,
        PixArtConfig, PixArtTransformer2DModel, QuantizedPixArtTransformer2DModel,
        QuantizedSD3Transformer2DModel, SD3Config, SD3Transformer2DModel,
        QuantizedUNet2DConditionModel, UNet2DConfig, UNet2DConditionModel,
    )

    rng = np.random.RandomState(0)
    if args.family == "flux":
        wrapper_cls = QuantizedFluxTransformer2DModel
        config = FluxConfig(in_channels=32, num_layers=2, num_single_layers=4,
                            attention_head_dim=64, num_attention_heads=4,
                            joint_attention_dim=256, pooled_projection_dim=64,
                            axes_dims_rope=(16, 24, 24), dtype=jnp.bfloat16)
        model = FluxTransformer2DModel(config, rngs=nnx.Rngs(0))
        t_img, t_txt = 64, 16
        inputs = (
            jnp.asarray(rng.randn(1, t_img, 32), jnp.bfloat16),
            jnp.asarray(rng.randn(1, t_txt, 256), jnp.bfloat16),
            jnp.asarray(rng.randn(1, 64), jnp.bfloat16),
            jnp.asarray([0.5], jnp.float32),
            jnp.stack([np.zeros(t_img), np.arange(t_img) // 8, np.arange(t_img) % 8], 1).astype(np.float32),
            jnp.zeros((t_txt, 3), jnp.float32),
        )
    elif args.family == "sd3":
        wrapper_cls = QuantizedSD3Transformer2DModel
        config = SD3Config(sample_size=16, num_layers=2, attention_head_dim=64,
                           num_attention_heads=4, joint_attention_dim=256,
                           caption_projection_dim=256, pooled_projection_dim=64,
                           pos_embed_max_size=24, dtype=jnp.bfloat16)
        model = SD3Transformer2DModel(config, rngs=nnx.Rngs(0))
        inputs = (
            jnp.asarray(rng.randn(1, 16, 16, 16), jnp.bfloat16),
            jnp.asarray(rng.randn(1, 8, 256), jnp.bfloat16),
            jnp.asarray(rng.randn(1, 64), jnp.bfloat16),
            jnp.asarray([500.0], jnp.float32),
        )
    elif args.family == "unet":
        # The SD-1.5 conv UNet (the reference's StableDiffusion example
        # quantizes exactly this class) at a reduced size.
        wrapper_cls = QuantizedUNet2DConditionModel
        config = UNet2DConfig(
            sample_size=16, block_out_channels=(64, 128),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=2, cross_attention_dim=64, attention_head_dim=4,
            norm_num_groups=16, dtype=jnp.bfloat16,
        )
        model = UNet2DConditionModel(config, rngs=nnx.Rngs(0))
        inputs = (
            jnp.asarray(rng.randn(1, 4, 16, 16), jnp.bfloat16),
            jnp.asarray([500.0], jnp.float32),
            jnp.asarray(rng.randn(1, 8, 64), jnp.bfloat16),
        )
    else:
        wrapper_cls = QuantizedPixArtTransformer2DModel
        config = PixArtConfig(sample_size=16, num_layers=2, num_attention_heads=4,
                              attention_head_dim=32, cross_attention_dim=128,
                              caption_channels=256, dtype=jnp.bfloat16)
        model = PixArtTransformer2DModel(config, rngs=nnx.Rngs(0))
        inputs = (
            jnp.asarray(rng.randn(1, 16, 16, 4), jnp.bfloat16),
            jnp.asarray([500.0], jnp.float32),
            jnp.asarray(rng.randn(1, 8, 256), jnp.bfloat16),
        )

    if args.model:
        qmodel = wrapper_cls.from_pretrained(args.model, dtype=jnp.bfloat16)
        print(f"loaded quantized {args.family} from {args.model}")
    else:
        ref = model(*inputs)
        qmodel = wrapper_cls.quantize(model, weights=args.weights)
        out = qmodel(*inputs)
        r = np.asarray(ref, np.float32).ravel()
        o = np.asarray(out, np.float32).ravel()
        cos = float(np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o) + 1e-9))
        print(f"{args.family} {args.weights}: denoise-step cosine vs float = {cos:.5f}")

    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        reloaded = wrapper_cls.from_pretrained(td, dtype=jnp.bfloat16)
        out2 = reloaded(*inputs)
        print(f"save/load round trip OK: {os.listdir(td)} -> output {np.asarray(out2).shape}")


if __name__ == "__main__":
    main()
