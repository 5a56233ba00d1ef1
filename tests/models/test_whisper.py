"""Whisper NNX implementation vs the Hugging Face torch implementation.

Covers the ASR encoder-decoder class the torch reference's speech example
quantizes: conv frontend over log-mel features, sinusoidal encoder
positions (loaded from the checkpoint), learned decoder positions,
bias-free k_proj, cached decode and quantization."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import WhisperConfig, WhisperForConditionalGeneration
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config():
    from transformers import WhisperConfig as HFWhisperConfig

    return HFWhisperConfig(
        vocab_size=120, num_mel_bins=8, d_model=48,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        max_source_positions=32, max_target_positions=24,
        decoder_start_token_id=1, bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )


def _load_pair():
    import torch
    from transformers import WhisperForConditionalGeneration as HFWhisper

    torch.manual_seed(0)
    hf_config = _tiny_hf_config()
    torch_model = HFWhisper(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = WhisperForConditionalGeneration(
        WhisperConfig.from_hf(hf_config, dtype=jnp.float32)
    )
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair()


def _features(batch=2, frames=64, mels=8, seed=0):
    # HF Whisper requires frames == 2 * max_source_positions.
    return np.random.RandomState(seed).randn(batch, mels, frames).astype(np.float32)


def test_whisper_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    feats = _features()
    dec_ids = np.random.RandomState(1).randint(0, 120, (2, 5)).astype(np.int64)
    with torch.no_grad():
        ref = torch_model(
            input_features=torch.from_numpy(feats),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    ours, _ = model(jnp.asarray(dec_ids), input_features=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_whisper_cached_decode_matches_full(torch_and_nnx):
    _, model = torch_and_nnx
    feats = jnp.asarray(_features(seed=2))
    dec_ids = jnp.asarray(np.random.RandomState(3).randint(0, 120, (2, 6)))
    full, _ = model(dec_ids, input_features=feats)
    enc = model.encode(feats)
    cache = model.init_decoder_cache(enc, 8)
    logits, cache = model(dec_ids[:, :3], cache, 0)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :3]), rtol=1e-4, atol=1e-5
    )
    for t in range(3, 6):
        step, cache = model(dec_ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5
        )


def test_whisper_generate_matches_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    feats = _features(seed=4)
    with torch.no_grad():
        ref = torch_model.generate(
            torch.from_numpy(feats), max_new_tokens=6, min_new_tokens=6,
            do_sample=False, num_beams=1,
        ).numpy()
    ours = np.asarray(model.generate(jnp.asarray(feats), 6))
    np.testing.assert_array_equal(ours[:, : ref.shape[1]], ref)


def test_whisper_quantize_save_reload(tmp_path):
    from quanto_tpu.models import QuantizedModelForSeq2SeqLM

    _, model = _load_pair()
    feats = jnp.asarray(_features(seed=7))
    dec_ids = jnp.asarray(np.random.RandomState(8).randint(0, 120, (2, 3)))
    qmodel = QuantizedModelForSeq2SeqLM.quantize(model, weights="qint8")
    ref, _ = qmodel(dec_ids, input_features=feats)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForSeq2SeqLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out, _ = reloaded(dec_ids, input_features=feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_whisper_quantized(torch_and_nnx):
    _, model = _load_pair()
    feats = jnp.asarray(_features(seed=5))
    dec_ids = jnp.asarray(np.random.RandomState(6).randint(0, 120, (2, 4)))
    float_out, _ = model(dec_ids, input_features=feats)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "model.encoder.layers.0.self_attn.q_proj" in qmap
    assert "model.decoder.layers.0.encoder_attn.k_proj" in qmap
    q_out, _ = model(dec_ids, input_features=feats)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


def test_whisper_position_table_bound_errors(torch_and_nnx):
    # Regression: positions past max_target_positions used to clamp silently
    # (JAX out-of-bounds gather), reusing the last row's embedding.
    _, model = torch_and_nnx
    feats = jnp.asarray(_features(seed=9))
    enc = model.encode(feats)
    with pytest.raises(ValueError, match="max_target_positions"):
        model.init_decoder_cache(enc, model.config.max_target_positions + 1)
    too_long = jnp.zeros((2, model.config.max_target_positions + 1), jnp.int32)
    with pytest.raises(ValueError, match="max_target_positions"):
        model(too_long, input_features=feats)


def test_whisper_activation_quantized_generate():
    # Regression: with activations quantized, the final QLayerNorm's QArray
    # output reached the tied-embedding logits matmul and crashed.
    _, model = _load_pair()
    feats = jnp.asarray(_features(seed=10))
    ref = np.asarray(model.generate(feats, 5))
    qt.quantize(model, weights="qint8", activations="qint8")
    with qt.Calibration(model):
        model.generate(feats, 5)
    qt.freeze(model)
    out = np.asarray(model.generate(feats, 5))
    assert out.shape == ref.shape
