"""Example: quantize an OWLv2 open-vocabulary detector.

Analogue of the reference's
`examples/vision/object-detection/quantize_owl_model.py` (quantize →
detect → print boxes over a score threshold), using the native
`Owlv2ForObjectDetection` family. Offline environment: the model is
randomly initialized (pass --model DIR for a local HF checkpoint) and the
image is synthetic, so the detections demonstrate the pipeline rather than
semantics.

    python examples/quantize_object_detection.py --weights qint8
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="qint8", choices=["qint4", "qint8", "qfloat8_e4m3fn"])
    p.add_argument("--model", default=None, help="local HF checkpoint dir")
    p.add_argument("--threshold", type=float, default=0.6)
    args = p.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import Owlv2Config, Owlv2ForObjectDetection
    from quanto_tpu.models.owlv2 import Owlv2TowerConfig

    if args.model:
        from quanto_tpu.models import from_pretrained_float

        model = from_pretrained_float(args.model, dtype=jnp.bfloat16)
    else:
        config = Owlv2Config(
            vocab_size=64, max_position_embeddings=16,
            text=Owlv2TowerConfig(32, 64, 2, 4),
            image_size=24, patch_size=8,
            vision=Owlv2TowerConfig(32, 64, 2, 4),
            projection_dim=32,
        )
        model = Owlv2ForObjectDetection(config, rngs=nnx.Rngs(0))

    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(1, 3, model.config.image_size, model.config.image_size), jnp.float32)
    # Two text queries (token sequences; a real run would use the tokenizer).
    ids = jnp.asarray(rng.randint(1, model.config.vocab_size, (2, 6)), jnp.int32)
    mask = jnp.ones_like(ids)

    def detect(model, tag):
        out = model(ids, pixels, mask)
        scores = np.asarray(jnp.max(jnp.asarray(out["logits"]), axis=-1))  # best query per patch
        probs = 1 / (1 + np.exp(-scores))
        boxes = np.asarray(out["pred_boxes"])
        keep = probs[0] >= args.threshold
        print(f"{tag}: {int(keep.sum())} boxes over {args.threshold:.2f}")
        for i in np.nonzero(keep)[0][:5]:
            q = int(np.argmax(np.asarray(out["logits"])[0, i]))
            cx, cy, w, h = boxes[0, i]
            print(f"  query {q} p={probs[0, i]:.3f} box=({cx:.2f},{cy:.2f},{w:.2f},{h:.2f})")
        return probs, boxes

    p_ref, b_ref = detect(model, "float")
    qt.quantize(model, weights=args.weights)
    qt.freeze(model)
    p_q, b_q = detect(model, f"quantized {args.weights}")
    print(f"score drift: {np.abs(p_ref - p_q).max():.4f}  box drift: {np.abs(b_ref - b_q).max():.4f}")
    qmap = qt.quantization_map(model)
    print(f"quantized modules: {len(qmap)}")


if __name__ == "__main__":
    main()
