"""DeepSeek-V3 NNX implementation vs the Hugging Face torch one.

Covers MLA (low-rank q, compressed kv latent + shared rotary key,
interleaved rope), the sigmoid/group-limited MoE router with selection bias
and shared experts, the weight-absorbed latent-cache decode path, and
quantize/save/reload."""

import numpy as np
import pytest
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.models import DeepseekV3Config, DeepseekV3ForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict

IDS = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)


def _tiny_hf_config(**kw):
    from transformers import DeepseekV3Config as HFDeepseekV3Config

    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 48)
    kw.setdefault("intermediate_size", 96)
    kw.setdefault("moe_intermediate_size", 32)
    kw.setdefault("num_hidden_layers", 3)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 4)
    kw.setdefault("q_lora_rank", 24)
    kw.setdefault("kv_lora_rank", 16)
    kw.setdefault("qk_rope_head_dim", 8)
    kw.setdefault("qk_nope_head_dim", 12)
    kw.setdefault("v_head_dim", 10)
    kw.setdefault("n_routed_experts", 8)
    kw.setdefault("n_group", 4)
    kw.setdefault("topk_group", 2)
    kw.setdefault("num_experts_per_tok", 2)
    kw.setdefault("n_shared_experts", 1)
    kw.setdefault("first_k_dense_replace", 1)
    kw.setdefault("attn_implementation", "eager")
    return HFDeepseekV3Config(**kw)


def _load_pair(hf_config):
    import torch
    from transformers import DeepseekV3ForCausalLM as HFDeepseekV3

    torch.manual_seed(0)
    torch_model = HFDeepseekV3(hf_config).eval()
    # Randomize the router selection biases (zero-init would make group
    # routing degenerate) — keep parity by writing them into BOTH models.
    with torch.no_grad():
        for layer in torch_model.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.5, 0.5)
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = DeepseekV3ForCausalLM(DeepseekV3Config.from_hf(hf_config, dtype=jnp.float32))
    report = load_hf_state_dict(model, tensors)
    assert report["missing"] == [], report["missing"]
    assert all("lm_head" in k for k in report["unexpected"]), report["unexpected"]
    return torch_model, model


@pytest.fixture(scope="module")
def torch_and_nnx():
    return _load_pair(_tiny_hf_config())


def test_deepseek_v3_logits_match_hf(torch_and_nnx):
    import torch

    torch_model, model = torch_and_nnx
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(IDS)).logits.numpy()
    ours, _ = model(jnp.asarray(IDS))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_deepseek_v3_no_q_lora_variant():
    """q_lora_rank=None uses a direct q_proj (modeling_deepseek_v3.py:346-351)."""
    import torch

    torch_model, model = _load_pair(_tiny_hf_config(q_lora_rank=None))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(IDS)).logits.numpy()
    ours, _ = model(jnp.asarray(IDS))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_deepseek_v3_latent_cache_decode(torch_and_nnx):
    """The weight-absorbed latent-cache decode is an exact rewrite of the
    expanded attention: prefill+decode must reproduce the no-cache logits."""
    _, model = torch_and_nnx
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, jnp.float32)
    logits, cache = model(ids[:, :4], cache, 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-5)
    for t in range(4, 6):
        step, cache = model(ids[:, t : t + 1], cache, t)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5)


def test_deepseek_v3_cache_is_compressed(torch_and_nnx):
    """The cache stores the latent (kv_lora_rank + rope dim per token), not
    per-head K/V — the MLA memory win."""
    _, model = torch_and_nnx
    c = model.config
    cache = model.init_kv_cache(2, 8, jnp.float32)
    latent, rope = cache[0]
    assert latent.shape == (2, 8, c.kv_lora_rank)
    assert rope.shape == (2, 8, c.qk_rope_head_dim)
    per_tok = c.kv_lora_rank + c.qk_rope_head_dim
    expanded = c.num_attention_heads * (c.qk_nope_head_dim + c.qk_rope_head_dim + c.v_head_dim)
    assert per_tok < expanded


def test_deepseek_v3_quantized_latent_cache(torch_and_nnx):
    """int8 latent cache: prefill+decode tracks the float-cache logits
    closely (per-token scales on an RMSNormed latent)."""
    _, model = torch_and_nnx
    ids = jnp.asarray(IDS)
    full, _ = model(ids)
    cache = model.init_kv_cache(1, 8, kv_quant="qint8")
    logits, cache = model(ids[:, :4], cache, 0)
    ref = np.asarray(full[:, :4])
    got = np.asarray(logits)
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999, cos
    step, cache = model(ids[:, 4:5], cache, 4)
    ref = np.asarray(full[:, 4])
    got = np.asarray(step[:, 0])
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999, cos


def test_deepseek_v3_quantize_save_reload(tmp_path, torch_and_nnx):
    from quanto_tpu.models import QuantizedModelForCausalLM

    _, model = torch_and_nnx
    ids = jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8")
    ref, _ = qmodel(ids)
    qmodel.save_pretrained(str(tmp_path))
    reloaded = QuantizedModelForCausalLM.from_pretrained(str(tmp_path), dtype=jnp.float32)
    qmap = qt.quantization_map(reloaded._wrapped)
    assert "model.layers.0.self_attn.kv_b_proj" in qmap
    assert "model.layers.1.mlp.experts.0.gate_proj" in qmap
    out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_deepseek_v3_tp_sharding():
    """Column-shard the per-head up-projections over a virtual mesh and check
    logits are unchanged."""
    import jax

    if jax.device_count() < 2 or jax.default_backend() == "tpu":
        pytest.skip("needs a multi-device (CPU) mesh")
    from quanto_tpu.parallel import DEEPSEEK_V3_TP_RULES, make_mesh, shard_model

    torch_model, model = _load_pair(_tiny_hf_config())
    ids = jnp.asarray(IDS)
    ref, _ = model(ids)
    mesh = make_mesh({"tp": 2}, jax.devices()[:2])
    shard_model(model, mesh, DEEPSEEK_V3_TP_RULES)
    with mesh:
        out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
