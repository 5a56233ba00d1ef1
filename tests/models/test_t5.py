"""T5 NNX implementation vs the Hugging Face torch implementation.

Covers the encoder-decoder architecture class: relative position bias
(bidirectional encoder / causal decoder buckets), cross-attention with
precomputed encoder K/V, tied-embedding logit scaling, the gated-gelu v1.1
variant, cached decode vs full forward, and quantization."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import T5Config, T5ForConditionalGeneration
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config(**kw):
    from transformers import T5Config as HFT5Config

    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 48)
    kw.setdefault("d_kv", 12)
    kw.setdefault("d_ff", 96)
    kw.setdefault("num_layers", 2)
    kw.setdefault("num_heads", 4)
    kw.setdefault("relative_attention_num_buckets", 8)
    kw.setdefault("relative_attention_max_distance", 16)
    kw.setdefault("decoder_start_token_id", 0)
    return HFT5Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import T5ForConditionalGeneration as HFT5

    torch.manual_seed(0)
    torch_model = HFT5(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = T5ForConditionalGeneration(T5Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def _ids(shape, seed=0, vocab=96):
    return np.random.RandomState(seed).randint(0, vocab, shape).astype(np.int64)


def test_t5_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    enc_ids = _ids((2, 7))
    dec_ids = _ids((2, 5), seed=1)
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(enc_ids),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    ours, _ = model(jnp.asarray(dec_ids), encoder_input_ids=jnp.asarray(enc_ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_t5_long_rel_positions_match_hf(torch_and_nnx):
    # Distances beyond max_distance exercise the logarithmic buckets.
    import torch

    torch_model, model = torch_and_nnx
    enc_ids = _ids((1, 33), seed=2)
    dec_ids = _ids((1, 29), seed=3)
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(enc_ids),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    ours, _ = model(jnp.asarray(dec_ids), encoder_input_ids=jnp.asarray(enc_ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_t5_v11_gated_untied_match_hf():
    import torch

    torch_model, model = _load_pair(
        _tiny_hf_config(feed_forward_proj="gated-gelu", tie_word_embeddings=False)
    )
    enc_ids = _ids((1, 6), seed=4)
    dec_ids = _ids((1, 4), seed=5)
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(enc_ids),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    ours, _ = model(jnp.asarray(dec_ids), encoder_input_ids=jnp.asarray(enc_ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_t5_encoder_padding_mask(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    enc_ids = _ids((2, 8), seed=6)
    dec_ids = _ids((2, 3), seed=7)
    attn = np.ones((2, 8), np.int64)
    attn[0, 5:] = 0
    attn[1, 7:] = 0
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(enc_ids),
            attention_mask=torch.from_numpy(attn),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()
    ours, _ = model(
        jnp.asarray(dec_ids),
        encoder_input_ids=jnp.asarray(enc_ids),
        enc_mask=jnp.asarray(attn, bool),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_t5_cached_decode_matches_full(torch_and_nnx):
    _, model = torch_and_nnx
    enc_ids = jnp.asarray(_ids((2, 7), seed=8))
    dec_ids = jnp.asarray(_ids((2, 6), seed=9))
    full, _ = model(dec_ids, encoder_input_ids=enc_ids)
    enc = model.encode(enc_ids)
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


def test_t5_quantized_cache_decode(torch_and_nnx):
    _, model = torch_and_nnx
    enc_ids = jnp.asarray(_ids((1, 7), seed=10))
    dec_ids = jnp.asarray(_ids((1, 5), seed=11))
    full, _ = model(dec_ids, encoder_input_ids=enc_ids)
    enc = model.encode(enc_ids)
    cache = model.init_decoder_cache(enc, 8, kv_quant="qint8")
    logits = None
    for t in range(5):
        logits, cache = model(dec_ids[:, t : t + 1], cache, t)
    ref = np.asarray(full[:, -1])
    ours = np.asarray(logits[:, 0])
    cos = (ref * ours).sum() / (np.linalg.norm(ref) * np.linalg.norm(ours))
    assert cos > 0.999


def test_t5_generate_greedy(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    enc_ids = _ids((2, 6), seed=12)
    with torch.no_grad():
        ref = torch_model.generate(
            torch.from_numpy(enc_ids), max_new_tokens=8, min_new_tokens=8,
            do_sample=False, num_beams=1,
        ).numpy()
    ours = np.asarray(model.generate(jnp.asarray(enc_ids), 8))
    np.testing.assert_array_equal(ours[:, : ref.shape[1]], ref)


def test_t5_quantize_save_reload(tmp_path, torch_and_nnx):
    """The reference's end-to-end shape, seq2seq flavor: quantize →
    save_pretrained → from_pretrained → logits equality."""
    from quanto_tpu.models import QuantizedModelForSeq2SeqLM

    _, model = _load_pair(_tiny_hf_config())
    enc_ids = jnp.asarray(_ids((1, 6), seed=16))
    dec_ids = jnp.asarray(_ids((1, 4), seed=17))
    qmodel = QuantizedModelForSeq2SeqLM.quantize(model, weights="qint8", exclude="lm_head")
    ref, _ = qmodel(dec_ids, encoder_input_ids=enc_ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForSeq2SeqLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "decoder.block.0.layer.1.EncDecAttention.q" in qmap
    out, _ = reloaded(dec_ids, encoder_input_ids=enc_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_t5_serve_scan_decode(torch_and_nnx):
    """The decode signature matches the causal-LM families, so the jitted
    lax.scan decoder from serve.make_decode_fn drives T5 unchanged."""
    from flax import nnx

    from quanto_tpu.models.serve import make_decode_fn

    _, model = torch_and_nnx
    enc_ids = jnp.asarray(_ids((2, 6), seed=15))
    ref = np.asarray(model.generate(enc_ids, 6))
    graphdef, state = nnx.split(model)
    decode = make_decode_fn(graphdef, 5)
    enc = model.encode(enc_ids)
    cache = model.init_decoder_cache(enc, 8)
    tok = jnp.full((2, 1), model.config.decoder_start_token_id, jnp.int32)
    logits, cache = model(tok, cache, 0)
    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    rest, _ = decode(state, nxt, cache, 1)
    ours = np.concatenate([np.asarray(tok), np.asarray(nxt), np.asarray(rest)], axis=1)
    np.testing.assert_array_equal(ours, ref)


def test_t5_quantize_freeze_roundtrip(torch_and_nnx):
    from quanto_tpu.models.loading import hf_state_dict

    _, model = _load_pair(_tiny_hf_config())
    enc_ids = jnp.asarray(_ids((1, 6), seed=13))
    dec_ids = jnp.asarray(_ids((1, 4), seed=14))
    float_out, _ = model(dec_ids, encoder_input_ids=enc_ids)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "encoder.block.0.layer.0.SelfAttention.q" in qmap
    assert "decoder.block.0.layer.1.EncDecAttention.k" in qmap
    q_out, _ = model(dec_ids, encoder_input_ids=enc_ids)
    ref = np.asarray(float_out).ravel()
    ours = np.asarray(q_out).ravel()
    cos = (ref * ours).sum() / (np.linalg.norm(ref) * np.linalg.norm(ours))
    assert cos > 0.99

    # State-dict round trip through the torch-convention flattened form.
    sd = hf_state_dict(model)
    assert "encoder.block.0.layer.0.SelfAttention.q.weight._data" in sd
    model2 = T5ForConditionalGeneration(model.config)
    qt.quantize(model2, weights="qint8")
    report = load_hf_state_dict(model2, sd)
    assert report["missing"] == [], report["missing"]
    qt.freeze(model2)
    out2, _ = model2(dec_ids, encoder_input_ids=enc_ids)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(q_out), rtol=1e-5, atol=1e-5)


def test_t5_activation_quantized_generate():
    # Regression: with activations quantized, a QArray reaching _lm_logits
    # (tied-embedding scaling + matmul) crashed.
    _, model = _load_pair(_tiny_hf_config())
    enc_ids = jnp.asarray(_ids((2, 6), seed=11))
    ref = np.asarray(model.generate(enc_ids, 5))
    qt.quantize(model, weights="qint8", activations="qint8")
    with qt.Calibration(model):
        model.generate(enc_ids, 5)
    qt.freeze(model)
    out = np.asarray(model.generate(enc_ids, 5))
    assert out.shape == ref.shape
