"""Pipeline parallelism (GPipe microbatching over a "pp" mesh axis).

Oracle: the unpipelined model forward — the pipeline is an execution
transform, so logits must match to accumulation tolerance for float AND
frozen-quantized stages, composed with dp, and gradients must flow
(pipeline-parallel training step).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.parallel import make_mesh, pipeline_model


def _model(dtype=jnp.float32, layers=4):
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=dtype,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


def test_pipeline_matches_forward_float():
    model = _model()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (4, 8)), jnp.int32)
    ref, _ = model(ids)
    mesh = make_mesh({"pp": 4, "dp": 2})
    pl = pipeline_model(model, mesh, dp_axis="dp", num_microbatches=2)
    out = pl(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pipeline_matches_forward_quantized():
    model = _model()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (8, 8)), jnp.int32)
    ref, _ = model(ids)
    mesh = make_mesh({"pp": 2, "dp": 4})
    pl = pipeline_model(model, mesh, dp_axis="dp", num_microbatches=2)
    out = jax.jit(pl.apply)(pl.state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pipeline_bubble_independence():
    """More microbatches than stages: results stay exact (the bubble ticks
    compute masked garbage that must never leak)."""
    model = _model(layers=2)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (8, 6)), jnp.int32)
    ref, _ = model(ids)
    mesh = make_mesh({"pp": 2, "dp": 4})
    for mb in (2, 4, 8):  # dp axis unused: batch replicated across it
        pl = pipeline_model(model, mesh, num_microbatches=mb)
        np.testing.assert_allclose(
            np.asarray(pl(ids)), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"mb={mb}",
        )


def test_pipeline_training_grads():
    """jax.grad through the pipeline (ppermute/scan are differentiable):
    one pipeline-parallel training step moves the loss."""
    model = _model()
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 128, (4, 8)), jnp.int32)
    mesh = make_mesh({"pp": 4, "dp": 2})
    pl = pipeline_model(model, mesh, dp_axis="dp", num_microbatches=2)

    def loss_fn(state):
        logits = pl.apply(state, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        return jnp.mean(
            -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)
        )

    loss0, grads = jax.jit(jax.value_and_grad(loss_fn))(pl.state)
    assert np.isfinite(float(loss0))
    g_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads[0])
    )
    assert g_norm > 0  # gradients reach the pipelined stage weights
    new_state = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, pl.state, grads)
    loss1 = float(loss_fn(new_state))
    assert loss1 < float(loss0)
