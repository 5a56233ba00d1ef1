"""Example: post-training quantization of a ViT image classifier.

Analogue of the reference's
`examples/vision/image-classification/pets/quantize_vit_model.py` pipeline
(evaluate float -> quantize -> calibrate -> freeze -> serialize/requantize ->
evaluate), using the native `ViTForImageClassification` family and a
synthetic two-class image dataset (class = which image half is brighter) so
it runs offline.

    python examples/quantize_vit_classifier.py --weights qint8 --activations qint8
"""

from __future__ import annotations

import argparse
import tempfile

import numpy as np

SIZE, PATCH, CLASSES = 24, 8, 2


def make_data(n=512, seed=0):
    """Class 1 iff the top half of the image is brighter than the bottom —
    a global property the CLS token must aggregate over patches."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 3, SIZE, SIZE).astype(np.float32)
    shift = rng.uniform(0.3, 0.8, size=(n, 1, 1, 1)).astype(np.float32)
    y = rng.randint(0, CLASSES, n)
    top = np.where(y == 1, shift[:, 0, 0, 0], -shift[:, 0, 0, 0])
    x[:, :, : SIZE // 2] += top[:, None, None, None]
    x[:, :, SIZE // 2 :] -= top[:, None, None, None]
    return x, y.astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="qint8")
    p.add_argument("--activations", default=None)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax.numpy as jnp
    import optax
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import QuantizedTransformersModel, ViTConfig, ViTForImageClassification

    config = ViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=SIZE, patch_size=PATCH,
        num_labels=CLASSES,
    )
    model = ViTForImageClassification(config, rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def train_step(model, opt, x, y):
        def loss_fn(model):
            return optax.softmax_cross_entropy_with_integer_labels(model(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    def accuracy(model, x, y):
        pred = np.asarray(jnp.argmax(model(jnp.asarray(x)), -1))
        return float((pred == y).mean())

    X, Y = make_data()
    Xt, Yt = make_data(256, seed=1)
    x, y = jnp.asarray(X), jnp.asarray(Y)
    for step in range(args.steps):
        loss = train_step(model, opt, x, y)
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
    print(f"float accuracy              : {accuracy(model, Xt, Yt):.3f}")

    qt.quantize(model, weights=args.weights, activations=args.activations)
    print(f"dynamic quantized accuracy  : {accuracy(model, Xt, Yt):.3f}")
    if args.activations is not None:
        with qt.Calibration(model):
            model(jnp.asarray(X[:128]))
        print(f"calibrated accuracy         : {accuracy(model, Xt, Yt):.3f}")
    qt.freeze(model)
    print(f"frozen quantized accuracy   : {accuracy(model, Xt, Yt):.3f}")
    qmap = qt.quantization_map(model)
    kinds = sorted({type(m).__name__ for _n, m in qt.named_qmodules(model)})
    print(f"quantized modules: {len(qmap)} ({', '.join(kinds)})")

    # Serialize / reload round trip (the reference example's save_file /
    # requantize step).
    with tempfile.TemporaryDirectory() as tmp:
        QuantizedTransformersModel(model).save_pretrained(tmp)
        reloaded = QuantizedTransformersModel.from_pretrained(tmp, dtype=jnp.float32)
        print(f"reloaded quantized accuracy : {accuracy(reloaded, Xt, Yt):.3f}")


if __name__ == "__main__":
    main()
