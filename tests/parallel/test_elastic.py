"""Failure detection + elastic checkpoint/resume (the reference has no
robustness surface, SURVEY.md §5.3; this is the TPU build's own layer)."""

import os
import time

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.parallel import ElasticCheckpointer, Watchdog, barrier_probe, supervise


def _model(seed=0):
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, dtype=jnp.float32,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))


def test_checkpoint_roundtrip_and_pruning(tmp_path):
    model = _model()
    qt.quantize(model, weights="qint4", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.array([[1, 5, 9]], dtype=np.int64))
    ref, _ = model(ids)

    ckpt = ElasticCheckpointer(str(tmp_path), interval_steps=10, keep=2)
    assert ckpt.latest() is None
    assert not ckpt.maybe_save(7, model)          # off-interval
    assert ckpt.maybe_save(10, model, {"lr": 0.1})
    ckpt.save(20, model)
    ckpt.save(30, model)
    assert ckpt.latest() == 30
    # keep=2 pruned step_10
    assert not os.path.exists(ckpt.path(10))

    other = _model(seed=1)
    qt.quantize(other, weights="qint4", exclude="lm_head")
    qt.freeze(other)
    state = ElasticCheckpointer(str(tmp_path)).restore(other)
    assert state["step"] == 30
    out, _ = other(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_checkpoint_atomicity(tmp_path):
    """A crash mid-save never surfaces a partial checkpoint."""
    model = _model()
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    ckpt = ElasticCheckpointer(str(tmp_path))

    import quanto_tpu.serialization as ser

    orig = ser.save_file

    def boom(*a, **k):
        orig(*a, **k)
        raise RuntimeError("injected crash before rename")

    ser.save_file, saved = boom, ser.save_file
    try:
        with pytest.raises(RuntimeError):
            ckpt.save(5, model)
    finally:
        ser.save_file = saved
    assert ckpt.latest() is None  # tmp dir cleaned, no step_5
    assert not any(n.startswith("step_") for n in os.listdir(tmp_path))


def test_watchdog_fires_and_beats_defer(tmp_path):
    fired = []
    with Watchdog(timeout_s=0.3, on_stall=lambda: fired.append(1), poll_s=0.05) as wd:
        for _ in range(4):  # regular beats keep it quiet
            time.sleep(0.1)
            wd.beat()
        assert not fired
        time.sleep(0.6)  # stall
    assert fired == [1]
    assert wd.stalled


def test_barrier_probe_single_process():
    assert barrier_probe(timeout_s=1.0) is True


def test_supervise_recovers_and_matches_uninterrupted(tmp_path):
    """A QAT-style loop with an injected failure resumes from the checkpoint
    and lands on the same final weights as an uninterrupted run."""
    def run(inject_failure, root):
        model = _model()
        qt.quantize(model, weights="qint8", exclude="lm_head")
        for _n, m in qt.named_qmodules(model):
            m.qat = True
        ids = jnp.asarray(np.array([[1, 5, 9, 3, 7, 2, 4, 8]], dtype=np.int64))
        import jax
        graphdef, _ = nnx.split(model)

        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            logits, _ = m(ids)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(logp, ids[:, 1:][..., None], -1))

        grad_fn = jax.jit(jax.grad(loss_fn))
        failed = {"done": False}

        def step(i):
            if inject_failure and i == 7 and not failed["done"]:
                failed["done"] = True
                raise RuntimeError("injected")
            _, state = nnx.split(model)
            grads = grad_fn(state)
            new_state = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, state, grads)
            nnx.update(model, new_state)

        ckpt = ElasticCheckpointer(root, interval_steps=5, keep=3)
        supervise(step, model, ckpt, num_steps=10, max_failures=2)
        _, state = nnx.split(model)
        return model, state

    m_ref, _ = run(False, str(tmp_path / "a"))
    m_rec, _ = run(True, str(tmp_path / "b"))
    ids = jnp.asarray(np.array([[2, 4, 6]], dtype=np.int64))
    np.testing.assert_allclose(
        np.asarray(m_rec(ids)[0]), np.asarray(m_ref(ids)[0]), rtol=1e-4, atol=1e-4
    )


def test_supervise_gives_up_after_max_failures(tmp_path):
    model = _model()
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    ckpt = ElasticCheckpointer(str(tmp_path), interval_steps=1)

    def step(i):
        raise RuntimeError("always fails")

    with pytest.raises(RuntimeError, match="always fails"):
        supervise(step, model, ckpt, num_steps=3, max_failures=2)


def test_checkpoint_orbax_backend_roundtrip(tmp_path, monkeypatch):
    """Cross-host-sharded weights route through orbax (forced here: a
    single-process CPU mesh is always fully addressable)."""
    model = _model()
    qt.quantize(model, weights="qint4", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.array([[1, 5, 9]], dtype=np.int64))
    ref, _ = model(ids)
    monkeypatch.setattr(ElasticCheckpointer, "_fully_addressable", staticmethod(lambda m: False))
    ckpt = ElasticCheckpointer(str(tmp_path), keep=1)
    ckpt.save(7, model, {"fmt": "orbax"})
    assert ckpt.latest() == 7
    other = _model(seed=1)
    qt.quantize(other, weights="qint4", exclude="lm_head")
    qt.freeze(other)
    state = ckpt.restore(other)
    assert state["step"] == 7 and state["format"] == "orbax"
    out, _ = other(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
