"""Example: post-training quantization of a small CNN image classifier.

Analogue of the reference's
`examples/vision/image-classification/mnist/quantize_mnist_model.py`
pipeline (train float -> quantize -> calibrate activations -> freeze ->
compare accuracy), exercising `QConv2d` (per-output-channel weights, NHWC
activations) alongside `QLinear`. Uses a synthetic blob-position dataset so
it runs offline (zero egress in this environment).

    python examples/quantize_cnn_classifier.py --weights qint8 --activations qint8
"""

from __future__ import annotations

import argparse

import numpy as np


def make_data(n=2048, seed=0, size=28, classes=4):
    """28x28 images with a bright Gaussian blob in one of 4 quadrants."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, n)
    cy = np.where(y % 2 == 0, size * 0.25, size * 0.75) + rng.randn(n) * 1.5
    cx = np.where(y // 2 == 0, size * 0.25, size * 0.75) + rng.randn(n) * 1.5
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.exp(
        -((yy[None] - cy[:, None, None]) ** 2 + (xx[None] - cx[:, None, None]) ** 2)
        / 12.0
    )
    img = img + rng.randn(n, size, size) * 0.15
    return img[..., None].astype(np.float32), y.astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="qint8")
    p.add_argument("--activations", default=None)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import quanto_tpu as qt

    class CNN(nnx.Module):
        def __init__(self, rngs):
            self.conv1 = nnx.Conv(1, 8, (3, 3), strides=2, rngs=rngs)
            self.conv2 = nnx.Conv(8, 16, (3, 3), strides=2, rngs=rngs)
            self.fc = nnx.Linear(7 * 7 * 16, 64, rngs=rngs)
            self.head = nnx.Linear(64, 4, rngs=rngs)

        def __call__(self, x):
            from quanto_tpu.ops.qops import dequantize

            h = jax.nn.relu(dequantize(self.conv1(x)))
            h = jax.nn.relu(dequantize(self.conv2(h)))
            h = h.reshape(h.shape[0], -1)
            h = jax.nn.relu(dequantize(self.fc(h)))
            return dequantize(self.head(h))

    X, Y = make_data()
    Xt, Yt = make_data(512, seed=1)
    model = CNN(nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def train_step(model, opt, x, y):
        def loss_fn(model):
            logits = model(x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    def accuracy(model, x, y):
        pred = np.asarray(jnp.argmax(model(jnp.asarray(x)), -1))
        return float((pred == y).mean())

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
            model(jnp.asarray(X[:256]))
        print(f"calibrated accuracy         : {accuracy(model, Xt, Yt):.3f}")

    qt.freeze(model)
    print(f"frozen quantized accuracy   : {accuracy(model, Xt, Yt):.3f}")
    qmap = qt.quantization_map(model)
    convs = [k for k, v in qmap.items() if k.startswith("conv")]
    print(f"quantized modules: {sorted(qmap)} (convs: {convs})")


if __name__ == "__main__":
    main()
