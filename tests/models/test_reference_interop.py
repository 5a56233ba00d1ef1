"""Cross-framework checkpoint interop: quantize a model with the TORCH
reference implementation (optimum-quanto), then load its state dict with
quanto_tpu and compare logits.

This is the strongest serialization-parity oracle available: the flattened
tensor names, packed payload bytes, and dequantization semantics must all
match for the logits to agree. Skipped when the reference isn't mounted.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.loading import load_hf_state_dict


def _import_reference():
    sys.path.insert(0, "/root/reference")
    try:
        import optimum.quanto as oq  # noqa: F401

        return oq
    except Exception:
        return None


oq = _import_reference()
pytestmark = pytest.mark.skipif(oq is None, reason="torch reference not available")


def _tiny_hf_config():
    from transformers import LlamaConfig as HFLlamaConfig

    return HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )


def _torch_to_jnp(v):
    import torch

    if v.dtype == torch.float8_e4m3fn:
        import jax

        return jax.lax.bitcast_convert_type(
            jnp.asarray(v.view(torch.uint8).numpy()), jnp.float8_e4m3fn
        )
    return jnp.asarray(v.numpy())


@pytest.mark.parametrize("weights_name", ["qint8", "qint4", "qfloat8"])
def test_load_torch_quanto_checkpoint(weights_name):
    import torch
    from transformers import LlamaForCausalLM as HFLlama

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFLlama(hf_config).eval()

    oq.quantize(torch_model, weights=getattr(oq, weights_name), exclude="lm_head")
    oq.freeze(torch_model)
    qmap = oq.quantization_map(torch_model)
    expected = "qfloat8_e4m3fn" if weights_name == "qfloat8" else weights_name
    assert qmap["model.layers.0.self_attn.q_proj"]["weights"] == expected

    ids = np.array([[1, 5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref_logits = torch_model(torch.from_numpy(ids)).logits.float().numpy()

    # Flatten the torch state dict to plain arrays (quanto key naming);
    # float8 payloads bitcast through uint8 (torch fp8 has no .numpy()).
    sd = {k: _torch_to_jnp(v) for k, v in torch_model.state_dict().items()}

    # Build our model, apply the SAME qmap, load the torch-written tensors.
    import quanto_tpu as qt
    from quanto_tpu.nn.qmodule import quantize_module
    from quanto_tpu.quantize import get_module_by_name, set_module_by_name

    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    for name, cfg in qmap.items():
        m = get_module_by_name(model, name)
        qm = quantize_module(
            m,
            weights=None if cfg["weights"] == "none" else cfg["weights"],
            activations=None if cfg["activations"] == "none" else cfg["activations"],
        )
        if qm is not None:
            set_module_by_name(model, name, qm)
    report = load_hf_state_dict(model, sd)
    assert report["missing"] == [], report["missing"]

    ours, _ = model(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref_logits, rtol=5e-3, atol=5e-3)


def test_save_for_torch_reference_roundtrip():
    """Our save -> torch reference load: the serialized bytes round-trip into
    a torch quanto model that produces the same logits."""
    import torch
    from transformers import LlamaForCausalLM as HFLlama

    import quanto_tpu as qt
    from quanto_tpu.models.loading import hf_state_dict

    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    torch_model = HFLlama(hf_config).eval()
    tensors = {k: jnp.asarray(v.numpy()) for k, v in torch_model.state_dict().items()}
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    load_hf_state_dict(model, tensors)
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ours, _ = model(jnp.asarray(np.array([[1, 5, 17, 99]], dtype=np.int64)))

    sd = hf_state_dict(model)
    torch_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    oq.quantize(torch_model, weights=oq.qint8, exclude="lm_head")
    oq.freeze(torch_model)
    torch_model.load_state_dict(torch_sd, strict=False, assign=True)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(np.array([[1, 5, 17, 99]], dtype=np.int64))).logits.float().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-3, atol=5e-3)
