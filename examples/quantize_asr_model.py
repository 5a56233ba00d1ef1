"""Example: post-training quantization of a Whisper ASR model.

Analogue of the reference's
`examples/speech/speech_recognition/quantize_asr_model.py` pipeline
(transcribe a corpus with the float model -> quantize -> calibrate ->
freeze -> transcribe again -> compare), using the native
`WhisperForConditionalGeneration` family. The reference scores WER against
librispeech ground truth; offline we score **transcription agreement**: the
fraction of generated tokens where the quantized model matches the float
model's greedy transcription of the same audio (the float output plays the
role of the reference text).

    python examples/quantize_asr_model.py --weights qint8 --activations qint8
"""

from __future__ import annotations

import argparse
import tempfile
import time

import numpy as np

MEL_BINS, FRAMES = 16, 32  # log-mel features [B, mel, frames] (HF layout)


def make_features(n=8, seed=0):
    """Synthetic 'audio': band-limited log-mel-shaped noise with per-sample
    energy envelopes so different samples produce different transcriptions."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 1, FRAMES, dtype=np.float32)
    feats = []
    for i in range(n):
        base = rng.randn(MEL_BINS, FRAMES).astype(np.float32) * 0.1
        f0 = rng.uniform(1.0, 6.0)
        envelope = np.sin(2 * np.pi * f0 * t)[None, :]
        band = rng.randint(0, MEL_BINS - 4)
        base[band : band + 4] += envelope
        feats.append(base)
    return np.stack(feats)


def main():
    p = argparse.ArgumentParser(description="Whisper ASR quantization example")
    p.add_argument("--weights", default="qint8", choices=["qint4", "qint8", "qfloat8"])
    p.add_argument("--activations", default=None, choices=[None, "qint8", "qfloat8"])
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=12)
    args = p.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    import quanto_tpu as qt
    from quanto_tpu.models import (
        QuantizedModelForSeq2SeqLM,
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    config = WhisperConfig(
        vocab_size=256, num_mel_bins=MEL_BINS, d_model=64,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=128,
        max_source_positions=FRAMES // 2, max_target_positions=64,
        decoder_start_token_id=1,
    )
    model = WhisperForConditionalGeneration(config, rngs=nnx.Rngs(0))

    feats = jnp.asarray(make_features(args.samples))

    def transcribe(m, feats):
        start = time.time()
        ids = np.asarray(m.generate(feats, args.new_tokens))
        return ids, time.time() - start

    def agreement(hyp, ref):
        return float((hyp == ref).mean())

    ref_ids, ref_t = transcribe(model, feats)
    print(f"float transcription          : {feats.shape[0]} clips in {ref_t:.2f}s")

    qt.quantize(model, weights=args.weights, activations=args.activations)
    ids, _ = transcribe(model, feats)
    print(f"dynamic quantized agreement  : {agreement(ids, ref_ids):.3f}")
    if args.activations is not None:
        with qt.Calibration(model):
            model.generate(feats[: args.samples // 2], args.new_tokens)
        ids, _ = transcribe(model, feats)
        print(f"calibrated agreement         : {agreement(ids, ref_ids):.3f}")
    qt.freeze(model)
    ids, q_t = transcribe(model, feats)
    print(f"frozen quantized agreement   : {agreement(ids, ref_ids):.3f} ({q_t:.2f}s)")

    qmap = qt.quantization_map(model)
    print(f"quantized modules: {len(qmap)}")

    # Serialize / reload round trip.
    with tempfile.TemporaryDirectory() as tmp:
        QuantizedModelForSeq2SeqLM(model).save_pretrained(tmp)
        reloaded = QuantizedModelForSeq2SeqLM.from_pretrained(tmp, dtype=jnp.float32)
        ids2, _ = transcribe(reloaded, feats)
        assert (ids2 == ids).all(), "reloaded transcriptions diverged"
        print("reloaded quantized agreement : identical to frozen model")


if __name__ == "__main__":
    main()
