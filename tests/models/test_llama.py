"""Llama NNX implementation tests.

Oracle: the Hugging Face *torch* implementation on CPU (the reference uses
the same trick of comparing against dequantized float computation; here we
additionally verify our from-scratch transformer against the original).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaForCausalLM, LlamaConfig
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.models.loading import load_hf_state_dict, hf_state_dict

from ..helpers import assert_similar


def _tiny_hf_config():
    from transformers import LlamaConfig as HFLlamaConfig

    return HFLlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )


@pytest.fixture(scope="module")
def torch_and_nnx():
    import torch
    from transformers import LlamaForCausalLM as HFLlama

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFLlama(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    return torch_model, model


def test_llama_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_llama_kv_cache_matches_full_forward(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    full, _ = model(ids)
    cache = init_kv_cache(model.config, 1, 16, jnp.float32)
    # Prefill the first 5 tokens, then decode one at a time.
    logits, cache = model(ids[:, :5], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]), rtol=1e-4, atol=1e-5)
    for t in range(5, 8):
        step_logits, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5
        )


def test_llama_quantize_int8_close_to_float(torch_and_nnx):
    _, model_src = torch_and_nnx
    # Rebuild a fresh copy so quantization does not pollute the fixture.
    tensors = hf_state_dict(model_src)
    model = LlamaForCausalLM(LlamaConfig.from_hf(_tiny_hf_config(), dtype=jnp.float32))
    load_hf_state_dict(model, tensors)
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    ref, _ = model(ids)
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    out, _ = model(ids)
    assert_similar(out, ref, rtol=1e-2)


def test_llama_jit_forward(torch_and_nnx):
    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))

    @nnx.jit
    def fwd(model, ids):
        return model(ids)[0]

    out = fwd(model, ids)
    ref, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_llama_generate_greedy(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    ids = np.array([[1, 5, 17, 99]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model.generate(
            torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
    ours = model.generate(jnp.asarray(ids), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ours), ref)


# --- rope_scaling (Llama-3.1+ checkpoints: llama3/linear/dynamic/yarn) ------

_ROPE_CASES = [
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
    {"rope_type": "linear", "factor": 4.0},
    {"rope_type": "dynamic", "factor": 4.0},
    {"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 32},
    {"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 32,
     "mscale": 1.0, "mscale_all_dim": 0.8},
]


@pytest.mark.parametrize("rs", _ROPE_CASES, ids=lambda r: r["rope_type"] + (".mscale" if "mscale" in r else ""))
def test_rope_params_match_hf(rs):
    """inv_freq and attention scaling match transformers ROPE_INIT_FUNCTIONS."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from quanto_tpu.models.llama import freeze_rope_scaling, rope_params

    for head_dim, theta, maxpos in ((64, 10000.0, 128), (128, 500000.0, 16384)):
        cfg = HFLlamaConfig(
            hidden_size=head_dim * 32, num_attention_heads=32, rope_theta=theta,
            max_position_embeddings=maxpos, rope_scaling=dict(rs),
        )
        ref_inv, ref_att = ROPE_INIT_FUNCTIONS[rs["rope_type"]](cfg, device="cpu", seq_len=maxpos)
        inv, att = rope_params(head_dim, theta, freeze_rope_scaling(rs), maxpos)
        np.testing.assert_allclose(np.asarray(inv), ref_inv.numpy(), rtol=1e-6)
        assert abs(att - float(ref_att)) < 1e-6


@pytest.mark.parametrize("rs", _ROPE_CASES[:2], ids=lambda r: r["rope_type"])
def test_llama_rope_scaling_logits_match_hf(rs):
    """End-to-end: a rope-scaled tiny llama matches HF logits (the reference's
    headline bench model, Llama-3.1-8B, requires rope_type=llama3)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_config = _tiny_hf_config()
    hf_config.rope_scaling = dict(rs)
    torch.manual_seed(0)
    torch_model = HFLlama(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    assert model.config.rope_scaling is not None
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == []
    ids = np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_llama_rope_scaling_save_reload_roundtrip(tmp_path):
    from quanto_tpu.models import QuantizedModelForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling=(("factor", 8.0), ("high_freq_factor", 4.0),
                      ("low_freq_factor", 1.0),
                      ("original_max_position_embeddings", 64),
                      ("rope_type", "llama3")),
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    assert reloaded.config.rope_scaling == cfg.rope_scaling
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
