"""Sharded safetensors loading (reference `ShardedStateDict`,
`models/shared_dict.py:22-53` analogue): a model.safetensors.index.json with
multiple shards loads lazily through QuantizedModelForCausalLM."""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from quanto_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    QuantizedModelForCausalLM,
)
from quanto_tpu.models.loading import hf_state_dict
from quanto_tpu.utils.safetensors_io import LazySafetensors, save_file


def test_sharded_index_roundtrip():
    from transformers import LlamaConfig as HFLlamaConfig

    hf_config = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=jnp.float32))
    model._hf_config = hf_config
    qmodel = QuantizedModelForCausalLM.quantize(model, weights="qint8", exclude="lm_head")
    ids = jnp.asarray(np.array([[1, 5, 17]], dtype=np.int64))
    ref, _ = qmodel(ids)

    with tempfile.TemporaryDirectory() as td:
        qmodel.save_pretrained(td)
        # Re-split the single file into two shards + index.
        sd = hf_state_dict(qmodel._wrapped)
        names = sorted(sd.keys())
        half = len(names) // 2
        shards = {
            "model-00001-of-00002.safetensors": {k: sd[k] for k in names[:half]},
            "model-00002-of-00002.safetensors": {k: sd[k] for k in names[half:]},
        }
        weight_map = {}
        for fname, tensors in shards.items():
            save_file(tensors, os.path.join(td, fname))
            for k in tensors:
                weight_map[k] = fname
        os.remove(os.path.join(td, "model.safetensors"))
        with open(os.path.join(td, "model.safetensors.index.json"), "w") as f:
            json.dump({"weight_map": weight_map}, f)

        reloaded = QuantizedModelForCausalLM.from_pretrained(td, dtype=jnp.float32)
        out, _ = reloaded(ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_lazy_safetensors_mapping():
    with tempfile.TemporaryDirectory() as td:
        p1 = os.path.join(td, "a.safetensors")
        p2 = os.path.join(td, "b.safetensors")
        save_file({"x": jnp.arange(8, dtype=jnp.int32)}, p1)
        save_file({"y": jnp.ones((2, 2), jnp.float32)}, p2)
        lazy = LazySafetensors.from_files([p1, p2])
        assert set(lazy.keys()) == {"x", "y"}
        assert "x" in lazy and len(lazy) == 2
        np.testing.assert_array_equal(np.asarray(lazy["x"]), np.arange(8))
        np.testing.assert_array_equal(np.asarray(lazy["y"]), np.ones((2, 2)))
