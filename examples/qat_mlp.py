"""Example: quantization-aware training of an MLP classifier.

Analogue of the reference's `examples/vision/image-classification/mnist/quantize_mnist_model.py`
QAT loop: quantize -> train with straight-through fake-quant -> calibrate ->
freeze, reporting accuracy at each stage. Uses a synthetic two-moons-style
dataset so it runs offline.

    python examples/qat_mlp.py --weights qint4
"""

from __future__ import annotations

import argparse

import numpy as np


def make_data(n=2048, seed=0):
    rng = np.random.RandomState(seed)
    # Two noisy concentric rings.
    r = np.where(rng.rand(n) > 0.5, 1.0, 2.0)
    theta = rng.rand(n) * 2 * np.pi
    x = np.stack([r * np.cos(theta), r * np.sin(theta)], 1) + rng.randn(n, 2) * 0.15
    y = (r > 1.5).astype(np.int32)
    feats = np.concatenate([x, x**2, np.sin(3 * x)], 1).astype(np.float32)
    return feats, y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="qint8")
    p.add_argument("--steps", type=int, default=300)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import quanto_tpu as qt

    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.fc1 = nnx.Linear(6, 64, rngs=rngs)
            self.fc2 = nnx.Linear(64, 64, rngs=rngs)
            self.head = nnx.Linear(64, 2, rngs=rngs)

        def __call__(self, x):
            from quanto_tpu.ops.qops import dequantize

            h = jax.nn.relu(dequantize(self.fc1(x)))
            h = jax.nn.relu(dequantize(self.fc2(h)))
            return dequantize(self.head(h))

    X, Y = make_data()
    Xt, Yt = make_data(512, seed=1)
    model = MLP(nnx.Rngs(0))
    qt.quantize(model, weights=args.weights)
    for _name, m in qt.named_qmodules(model):
        m.qat = True  # differentiable fake-quant with STE

    opt = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)

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
        if step % 100 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
    print(f"QAT accuracy (fake-quant): {accuracy(model, Xt, Yt):.3f}")

    for _name, m in qt.named_qmodules(model):
        m.qat = False
    qt.freeze(model)
    print(f"frozen quantized accuracy: {accuracy(model, Xt, Yt):.3f}")


if __name__ == "__main__":
    main()
