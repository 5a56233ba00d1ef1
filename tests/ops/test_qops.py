"""Quantized-activation op tests (reference
`tests/tensor/activations/test_activations_dispatch.py` analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import quanto_tpu as qt
from quanto_tpu.ops import qops

from ..helpers import assert_similar, random_qactivation, random_tensor


def test_qtranspose_keeps_quantized():
    qa = random_qactivation((8, 16), qt.qint8)
    out = qops.qtranspose(qa)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), np.asarray(qa.dequantize()).T
    )


def test_qreshape_keeps_quantized():
    qa = random_qactivation((8, 16), qt.qint8)
    out = qops.qreshape(qa, (4, 32))
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), np.asarray(qa.dequantize()).reshape(4, 32)
    )


def test_qcat_same_scale_stays_quantized():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qcat([qa, qa], axis=0)
    assert isinstance(out, qt.ActivationQBytesArray)
    assert out.shape == (8, 8)


def test_qcat_different_scale_dequantizes():
    qa = random_qactivation((4, 8), qt.qint8, key=jax.random.PRNGKey(0))
    qb = random_qactivation((4, 8), qt.qint8, key=jax.random.PRNGKey(7))
    out = qops.qcat([qa, qb], axis=0)
    assert not isinstance(out, qt.ActivationQBytesArray)
    assert out.shape == (8, 8)


def test_qmul_scalar_folds_into_scale():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qmul_scalar(qa, 2.5)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_array_equal(np.asarray(out._data), np.asarray(qa._data))
    assert_similar(out.dequantize(), qa.dequantize() * 2.5)


def test_qrelu_int_keeps_codes():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qrelu(qa)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), np.maximum(np.asarray(qa.dequantize()), 0)
    )


def test_qrelu_fp8_falls_back():
    qa = random_qactivation((4, 8), qt.qfloat8_e4m3fn)
    out = qops.qrelu(qa)
    assert not isinstance(out, qt.ActivationQBytesArray)


def test_qsoftmax_requantizes_known_scale():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qsoftmax(qa, axis=-1)
    assert isinstance(out, qt.ActivationQBytesArray)
    assert float(out.scale) == pytest.approx(1 / 127, rel=1e-6)
    ref = jax.nn.softmax(qa.dequantize(), axis=-1)
    assert_similar(out.dequantize(), ref, rtol=1e-2)


def test_qmatmul_int8():
    qa = random_qactivation((4, 16), qt.qint8, key=jax.random.PRNGKey(1))
    qb = random_qactivation((16, 8), qt.qint8, key=jax.random.PRNGKey(2))
    out = qops.qmatmul(qa, qb)
    ref = qa.dequantize() @ qb.dequantize()
    assert_similar(out, ref, rtol=1e-3)


def test_qstack_same_scale_stays_quantized():
    a = random_qactivation((4, 8), qt.qint8)
    b = qops._rewrap(a, a._data + 1)
    out = qops.qstack([a, b], axis=0)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_array_equal(
        np.asarray(out._data), np.stack([np.asarray(a._data), np.asarray(b._data)])
    )


def test_qsplit_reindexes_payload():
    a = random_qactivation((4, 8), qt.qint8)
    parts = qops.qsplit(a, 2, axis=0)
    assert len(parts) == 2
    for i, p in enumerate(parts):
        assert isinstance(p, qt.ActivationQBytesArray)
        np.testing.assert_allclose(
            np.asarray(p.dequantize()), np.asarray(a.dequantize())[i * 2 : (i + 1) * 2]
        )


def test_qslice_and_select_exact():
    a = random_qactivation((4, 8), qt.qint8)
    s = qops.qslice(a, (slice(1, 3), slice(None)))
    assert isinstance(s, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(s.dequantize()), np.asarray(a.dequantize())[1:3]
    )
    sel = qops.qselect(a, 0, 2)
    np.testing.assert_allclose(
        np.asarray(sel.dequantize()), np.asarray(a.dequantize())[2]
    )


def test_qexpand_broadcasts_payload():
    a = random_qactivation((1, 8), qt.qint8)
    out = qops.qexpand(a, (4, 8))
    assert isinstance(out, qt.ActivationQBytesArray)
    assert out._data.shape == (4, 8)


def test_qwhere_same_scale_stays_quantized():
    a = random_qactivation((4, 8), qt.qint8)
    b = qops._rewrap(a, a._data + 1)
    cond = jnp.asarray(np.random.RandomState(0).rand(4, 8) > 0.5)
    out = qops.qwhere(cond, a, b)
    assert isinstance(out, qt.ActivationQBytesArray)
    ref = jnp.where(cond, a.dequantize(), b.dequantize())
    np.testing.assert_allclose(np.asarray(out.dequantize()), np.asarray(ref))


def test_qwhere_mixed_dequantizes():
    a = random_qactivation((4, 8), qt.qint8)
    b = random_tensor((4, 8))
    cond = jnp.asarray(np.random.RandomState(1).rand(4, 8) > 0.5)
    out = qops.qwhere(cond, a, b)
    assert not isinstance(out, qt.ActivationQBytesArray)


def test_qops_safe_under_jit():
    """qstack/qwhere/qcat must not concretize tracer scales under jit
    (conservative dequantize path when scale equality is unknowable)."""
    a = random_qactivation((4, 8), qt.qint8)
    b = random_qactivation((4, 8), qt.qint8)

    @jax.jit
    def f(a, b):
        s = qops.qstack([a, b])
        c = qops.qcat([a, b], axis=0)
        w = qops.qwhere(jnp.ones((4, 8), bool), a, b)
        return (qops.dequantize(s), qops.dequantize(c), qops.dequantize(w))

    s, c, w = f(a, b)
    np.testing.assert_allclose(
        np.asarray(s),
        np.stack([np.asarray(a.dequantize()), np.asarray(b.dequantize())]),
        rtol=1e-6,
    )
    assert c.shape == (8, 8) and w.shape == (4, 8)


def test_qstack_same_array_stays_quantized_under_jit():
    """Identical scale OBJECT (same tracer) is provably equal even in jit."""
    a = random_qactivation((4, 8), qt.qint8)

    @jax.jit
    def f(a):
        b = qops._rewrap(a, a._data + 1)  # shares a._scale
        out = qops.qstack([a, b])
        assert isinstance(out, qt.ActivationQBytesArray)
        return out.dequantize()

    assert f(a).shape == (2, 4, 8)


def test_qdiv_scalar_folds_into_scale():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qdiv_scalar(qa, 2.0)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), np.asarray(qa.dequantize()) / 2.0, rtol=1e-6
    )
    # Payload untouched: only the scale moved.
    np.testing.assert_array_equal(np.asarray(out._data), np.asarray(qa._data))


def test_qneg_int_negates_codes():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qneg(qa)
    assert isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), -np.asarray(qa.dequantize()), rtol=1e-6
    )


def test_qneg_qmin_saturates():
    from quanto_tpu.tensor.activations import ActivationQBytesArray

    data = jnp.asarray([[-128, -1, 0, 1, 127]], jnp.int8)
    qa = ActivationQBytesArray(
        _data=data, _scale=jnp.float32(0.5), qtype=qt.qint8, float_dtype=jnp.dtype(jnp.float32)
    )
    out = qops.qneg(qa)
    np.testing.assert_array_equal(
        np.asarray(out._data), np.asarray([[127, 1, 0, -1, -127]], np.int8)
    )


def test_qneg_fp8_falls_back():
    qa = random_qactivation((4, 8), qt.qfloat8_e4m3fn)
    out = qops.qneg(qa)
    assert not isinstance(out, qt.ActivationQBytesArray)
    np.testing.assert_allclose(np.asarray(out), -np.asarray(qa.dequantize()))


def test_qlt_same_scale_compares_codes():
    qa = random_qactivation((4, 8), qt.qint8)
    out = qops.qlt(qa, qops.qneg(qa))
    ref = np.asarray(qa.dequantize()) < -np.asarray(qa.dequantize())
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_qlt_mixed_dequantizes():
    qa = random_qactivation((4, 8), qt.qint8, key=jax.random.PRNGKey(0))
    qb = random_qactivation((4, 8), qt.qint8, key=jax.random.PRNGKey(9))
    out = qops.qlt(qa, qb)
    ref = np.asarray(qa.dequantize()) < np.asarray(qb.dequantize())
    np.testing.assert_array_equal(np.asarray(out), ref)
