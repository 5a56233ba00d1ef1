"""save_pretrained on a model built directly from a quanto_tpu config (no HF
checkpoint): the config.json is synthesized so from_pretrained round-trips."""

import tempfile

import numpy as np
import jax.numpy as jnp
from flax import nnx

from quanto_tpu.models import LlamaConfig, LlamaForCausalLM, QuantizedModelForCausalLM


def test_save_synthesizes_config():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="lm_head")
    ids = jnp.asarray(np.array([[1, 5, 17]], dtype=np.int64))
    ref, _ = qmodel(ids)
    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        reloaded = QuantizedModelForCausalLM.from_pretrained(td, dtype=jnp.float32)
        out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-6)
