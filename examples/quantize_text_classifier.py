"""Example: post-training quantization of a transformer text classifier.

Analogue of the reference's
`examples/nlp/text-classification/sst2/quantize_sst2_model.py` pipeline
(evaluate float -> quantize -> calibrate -> freeze -> evaluate quantized),
on an encoder-only transformer built from NNX primitives: token embedding,
bidirectional self-attention layers, mean pooling, classification head.
Quantizing with activations also exercises QLayerNorm (output-only
quantization). Uses a synthetic token-pattern dataset so it runs offline.

    python examples/quantize_text_classifier.py --weights qint8 --activations qint8
"""

from __future__ import annotations

import argparse

import numpy as np

VOCAB, SEQ, CLASSES = 64, 16, 2


def make_data(n=2048, seed=0):
    """Label 1 iff token 7 appears before token 13 somewhere in the sequence —
    requires attention across positions, not just bag-of-words."""
    rng = np.random.RandomState(seed)
    x = rng.randint(0, VOCAB, (n, SEQ))
    first7 = np.argmax(x == 7, axis=1)
    first13 = np.argmax(x == 13, axis=1)
    y = ((x == 7).any(1) & (x == 13).any(1) & (first7 < first13)).astype(np.int32)
    return x.astype(np.int32), y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="qint8")
    p.add_argument("--activations", default=None)
    p.add_argument("--steps", type=int, default=400)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.ops.qops import dequantize

    D, H = 64, 4

    class EncoderLayer(nnx.Module):
        def __init__(self, rngs):
            self.attn_norm = nnx.LayerNorm(D, epsilon=1e-5, rngs=rngs)
            self.q = nnx.Linear(D, D, rngs=rngs)
            self.k = nnx.Linear(D, D, rngs=rngs)
            self.v = nnx.Linear(D, D, rngs=rngs)
            self.o = nnx.Linear(D, D, rngs=rngs)
            self.mlp_norm = nnx.LayerNorm(D, epsilon=1e-5, rngs=rngs)
            self.fc1 = nnx.Linear(D, 2 * D, rngs=rngs)
            self.fc2 = nnx.Linear(2 * D, D, rngs=rngs)

        def __call__(self, x):
            B, T, _ = x.shape
            h = dequantize(self.attn_norm(x))
            q = dequantize(self.q(h)).reshape(B, T, H, D // H)
            k = dequantize(self.k(h)).reshape(B, T, H, D // H)
            v = dequantize(self.v(h)).reshape(B, T, H, D // H)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D // H) ** -0.5
            probs = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
            x = x + dequantize(self.o(attn))
            h = dequantize(self.mlp_norm(x))
            return x + dequantize(self.fc2(jax.nn.gelu(dequantize(self.fc1(h)))))

    class Classifier(nnx.Module):
        def __init__(self, rngs):
            self.embed = nnx.Embed(VOCAB, D, rngs=rngs)
            self.pos = nnx.Embed(SEQ, D, rngs=rngs)
            self.layers = nnx.List([EncoderLayer(rngs) for _ in range(2)])
            self.head = nnx.Linear(D, CLASSES, rngs=rngs)

        def __call__(self, ids):
            x = self.embed(ids) + self.pos.embedding.get_value()[None]
            for layer in self.layers:
                x = layer(x)
            return dequantize(self.head(x.mean(axis=1)))

    X, Y = make_data()
    Xt, Yt = make_data(512, seed=1)
    model = Classifier(nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

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

    x, y = jnp.asarray(X), jnp.asarray(Y)
    for step in range(args.steps):
        loss = train_step(model, opt, x, y)
        if step % 100 == 0:
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
    kinds = sorted({type(m).__name__ for _n, m in qt.named_qmodules(model)})
    print(f"quantized modules: {len(qmap)} ({', '.join(kinds)})")


if __name__ == "__main__":
    main()
