"""Workflow tests: quantize/calibrate/freeze an MLP, include/exclude patterns,
requantize, and serialization round-trips. Mirrors the reference
`tests/quantize/{test_quantize_mlp.py,test_quantize_patterns.py,test_requantize.py}`."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.nn import QLinear, QModuleMixin

from ..helpers import assert_similar, random_tensor


class MLP(nnx.Module):
    def __init__(self, rngs, d_in=32, d_hidden=256, d_out=16):
        self.input_layer = nnx.Linear(d_in, d_hidden, rngs=rngs)
        self.mid_layer = nnx.Linear(d_hidden, d_hidden, rngs=rngs)
        self.output_layer = nnx.Linear(d_hidden, d_out, rngs=rngs)

    def __call__(self, x):
        h = self.input_layer(x)
        h = jax.nn.relu(h.dequantize() if isinstance(h, qt.ActivationQBytesArray) else h)
        h = self.mid_layer(h)
        h = jax.nn.relu(h.dequantize() if isinstance(h, qt.ActivationQBytesArray) else h)
        out = self.output_layer(h)
        return out.dequantize() if isinstance(out, qt.ActivationQBytesArray) else out


def _fresh_mlp(seed=0):
    return MLP(nnx.Rngs(seed))


@pytest.mark.parametrize("weights", ["qint4", "qint8", "qfloat8_e4m3fn"])
def test_quantize_mlp_weights_only(weights):
    model = _fresh_mlp()
    x = random_tensor((8, 32), key=jax.random.PRNGKey(1))
    ref = model(x)
    qt.quantize(model, weights=weights)
    qmap = qt.quantization_map(model)
    assert set(qmap) == {"input_layer", "mid_layer", "output_layer"}
    out = model(x)
    assert_similar(out, ref, rtol=5e-2 if weights == "qint4" else 1e-2)
    qt.freeze(model)
    frozen = model(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frozen), rtol=1e-5, atol=1e-6)


def test_quantize_mlp_activations():
    model = _fresh_mlp()
    x = random_tensor((8, 32), key=jax.random.PRNGKey(2))
    ref = model(x)
    qt.quantize(model, weights="qint8", activations="qint8")
    with qt.Calibration(model):
        model(x)
    # Scales must have moved from the default 1.
    scale = model.mid_layer.input_scale.get_value()
    assert float(scale) != 1.0
    qt.freeze(model)
    out = model(x)
    assert_similar(out, ref, rtol=5e-2)


def test_quantize_include_exclude_patterns():
    model = _fresh_mlp()
    qt.quantize(model, weights="qint8", exclude="output_layer")
    assert isinstance(model.input_layer, QLinear)
    assert isinstance(model.mid_layer, QLinear)
    assert isinstance(model.output_layer, nnx.Linear)

    model2 = _fresh_mlp()
    qt.quantize(model2, weights="qint8", include="*mid*")
    assert isinstance(model2.input_layer, nnx.Linear)
    assert isinstance(model2.mid_layer, QLinear)
    assert isinstance(model2.output_layer, nnx.Linear)


@pytest.mark.parametrize("weights", ["qint4", "qint8", "qfloat8_e4m3fn"])
def test_requantize_roundtrip(weights):
    model = _fresh_mlp()
    x = random_tensor((8, 32), key=jax.random.PRNGKey(3))
    qt.quantize(model, weights=weights)
    qt.freeze(model)
    out = model(x)
    sd = qt.state_dict(model)
    qmap = qt.quantization_map(model)

    model2 = _fresh_mlp(seed=99)
    qt.requantize(model2, sd, qmap)
    for name, m in qt.named_qmodules(model2):
        assert m.frozen, name
    out2 = model2(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_safetensors_roundtrip():
    model = _fresh_mlp()
    x = random_tensor((8, 32), key=jax.random.PRNGKey(4))
    qt.quantize(model, weights="qint4")
    qt.freeze(model)
    out = model(x)
    from quanto_tpu.utils import load_file

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "model.safetensors")
        qt.serialization.save_file(model, path)
        model2 = _fresh_mlp(seed=7)
        qt.requantize(model2, load_file(path), qt.quantization_map(model))
        out2 = model2(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_quantized_weights_memory_smaller():
    model = _fresh_mlp()
    qt.quantize(model, weights="qint4")
    qt.freeze(model)
    sd = qt.state_dict(model)
    packed = sd["mid_layer.weight._data._data"]
    assert packed.dtype == jnp.uint8
    # 256x256 int4 packs into 128x256 bytes.
    assert packed.size * 8 == 256 * 256 * 4


def test_calibrate_jit_matches_eager():
    """`calibrate_jit` (one device call per batch) produces the same scales
    and streamline decisions as the eager Calibration context."""
    batches = [random_tensor((8, 32), key=jax.random.PRNGKey(i)) for i in range(3)]

    eager = _fresh_mlp()
    qt.quantize(eager, weights="qint8", activations="qint8")
    with qt.Calibration(eager):
        for b in batches:
            eager(b)

    jitted = _fresh_mlp()
    qt.quantize(jitted, weights="qint8", activations="qint8")
    qt.calibrate_jit(jitted, batches)

    for (name, me), (_, mj) in zip(qt.named_qmodules(eager), qt.named_qmodules(jitted)):
        np.testing.assert_allclose(
            np.asarray(me.input_scale.get_value()),
            np.asarray(mj.input_scale.get_value()),
            rtol=1e-6, err_msg=f"{name}.input_scale",
        )
        np.testing.assert_allclose(
            np.asarray(me.output_scale.get_value()),
            np.asarray(mj.output_scale.get_value()),
            rtol=1e-6, err_msg=f"{name}.output_scale",
        )
        assert me.quantize_outputs == mj.quantize_outputs, name
    qt.freeze(jitted)
    out = jitted(batches[0])
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_mlp_w4a8_kernel_path():
    """W4A8 (int4 weights + int8 activations) routes through the fused
    integer-MXU Pallas kernel (interpret mode off-TPU) and stays close to
    both the float reference and the dequantizing fallback path."""
    from quanto_tpu.ops import config as ops_config

    model = _fresh_mlp()
    x = random_tensor((8, 32), key=jax.random.PRNGKey(5))
    ref = model(x)
    qt.quantize(model, weights="qint4", activations="qint8")
    with qt.Calibration(model):
        model(x)
    qt.freeze(model)
    fallback = model(x)  # pallas off by default on CPU
    ops_config.set_backend(pallas_qbits=True)
    try:
        out = model(x)
    finally:
        ops_config.set_backend()
    assert_similar(out, ref, rtol=5e-2)
    assert_similar(out, fallback, rtol=1e-2)
