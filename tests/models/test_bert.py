"""BERT NNX implementation vs the Hugging Face torch implementation.

Covers the sequence-classification architecture the torch reference's sst2
example quantizes (`examples/nlp/text-classification/sst2/
quantize_sst2_model.py`): post-norm encoder, token-type embeddings,
attention-mask handling, pooler, quantization and save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import BertConfig, BertForSequenceClassification
from quanto_tpu.models.loading import load_hf_state_dict


def _tiny_hf_config():
    from transformers import BertConfig as HFBertConfig

    return HFBertConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2,
        id2label={0: "neg", 1: "pos"},
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )


def _load_pair():
    import torch
    from transformers import BertForSequenceClassification as HFBert

    torch.manual_seed(0)
    hf_config = _tiny_hf_config()
    torch_model = HFBert(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = BertForSequenceClassification(BertConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    # position_ids is a registered buffer in some transformers versions.
    assert all("position_ids" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair()


def _ids(batch=2, seq=12, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 120, (batch, seq)).astype(np.int64)
    mask = np.ones((batch, seq), np.int64)
    mask[1, seq - 4 :] = 0  # ragged batch exercises the additive mask
    types = rng.randint(0, 2, (batch, seq)).astype(np.int64)
    return ids, mask, types


def test_bert_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids, mask, types = _ids()
    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types),
        ).logits.numpy()
    ours = model(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_bert_quantized(torch_and_nnx):
    _, model = _load_pair()
    ids, mask, types = _ids(seed=1)
    args = (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    float_out = model(*args)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qmap = qt.quantization_map(model)
    assert "bert.encoder.layer.0.attention.self.query" in qmap
    assert "bert.pooler.dense" in qmap
    q_out = model(*args)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


def test_bert_calibrated_activations(torch_and_nnx):
    _, model = _load_pair()
    ids, mask, types = _ids(seed=2)
    args = (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    float_out = model(*args)
    qt.quantize(model, weights="qint8", activations="qint8")
    with qt.Calibration(model):
        model(*args)
    qt.freeze(model)
    q_out = model(*args)
    a = np.asarray(float_out).ravel()
    b = np.asarray(q_out).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95


def test_bert_quantize_save_reload(tmp_path):
    from quanto_tpu.models import QuantizedTransformersModel

    _, model = _load_pair()
    ids, mask, types = _ids(seed=3)
    args = (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types))
    qmodel = QuantizedTransformersModel.quantize(model, weights="qint8")
    ref = qmodel(*args)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedTransformersModel.from_pretrained(str(tmp_path), dtype=jnp.float32)
    out = reloaded(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
