"""Off-envelope padded kernel layout (round-5 fix).

Misaligned dims (N % 128, K alignment, or an auto group size like 96 that
can never satisfy the kernel's gs % 128 rule — e.g. GPT-OSS hidden 2880)
previously fell back to the XLA dequant matmul, measured 67x slower than
the Pallas kernel on hardware. `WeightQBitsTpuArray.from_generic` now
zero-pads each scale group's codes (gs -> gs_pad) and the N/K envelope,
keeping scale/shift VALUES and the serialized generic layout bit-identical;
`qlinear` zero-pads activations per group (exact: padded columns multiply
zero) and slices padded output rows.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import quanto_tpu as qt
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.qlinear import qlinear
from quanto_tpu.tensor.weights import WeightQBitsTpuArray


def _gen(N, K, gs, bits=4, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(N, K) * 0.1, jnp.float32)
    qtype = qt.qint4 if bits == 4 else qt.qint2
    s, z = qt.MaxOptimizer()(w, qtype, axis=0, group_size=gs)
    return qt.quantize_weight(w, qtype, 0, s, shift=z, group_size=gs)


# (N, K, gs): GPT-OSS attention shapes (gs=96 via the auto rule), odd-N,
# per-tensor small, and int2.
CASES = [
    (4096, 2880, 96, 4),   # gpt-oss q_proj: K and gs off-envelope
    (2880, 4096, 128, 4),  # gpt-oss o_proj: N off-envelope
    (512, 2880, 96, 4),    # gpt-oss k/v_proj
    (320, 576, 96, 4),     # both dims + gs off-envelope
    (256, 2880, 96, 2),    # int2 grouping
]


@pytest.mark.parametrize("N,K,gs,bits", CASES)
def test_padded_from_generic_roundtrip(N, K, gs, bits):
    """to_generic() of a padded layout is bit-identical to the source."""
    g = _gen(N, K, gs, bits)
    t = WeightQBitsTpuArray.from_generic(g)
    assert t is not None, "padding should make this eligible"
    assert t.pad is not None and t.orig_shape == (N, K)
    back = t.to_generic()
    np.testing.assert_array_equal(
        np.asarray(back._data._data), np.asarray(g._data._data)
    )
    np.testing.assert_array_equal(np.asarray(back._scale), np.asarray(g._scale))
    np.testing.assert_array_equal(np.asarray(back._shift), np.asarray(g._shift))
    # dequantize() matches the generic dequant exactly.
    np.testing.assert_allclose(
        np.asarray(t.dequantize()), np.asarray(g.dequantize()), atol=0, rtol=0
    )


@pytest.mark.parametrize("N,K,gs,bits", CASES[:3])
@pytest.mark.parametrize("m", [1, 8, 600])
def test_padded_qlinear_matches_dequant(N, K, gs, bits, m):
    """qlinear through the padded kernel == x @ dequant(w).T (interpret)."""
    g = _gen(N, K, gs, bits)
    t = WeightQBitsTpuArray.from_generic(g)
    assert t is not None and t.pad is not None
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(m, K) * 0.3, jnp.float32)
    ref = np.asarray(x) @ np.asarray(g.dequantize()).T
    ops_config.set_backend(pallas_qbits=True)
    try:
        out = qlinear(x, t)
    finally:
        ops_config.set_backend()
    assert out.shape == (m, N)
    a, b = np.asarray(out).ravel(), ref.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 1 - 1e-5, cos


def test_padded_w4a8_route():
    """int8-activation route pads x.data with zero int8 codes (exact)."""
    from quanto_tpu.tensor.activations import ActivationQBytesArray

    N, K, gs = 512, 2880, 96
    g = _gen(N, K, gs)
    t = WeightQBitsTpuArray.from_generic(g)
    assert t is not None and t.pad is not None
    rng = np.random.RandomState(2)
    xf = jnp.asarray(rng.randn(8, K) * 0.3, jnp.float32)
    scale = qt.AbsmaxOptimizer()(xf, qt.qint8, None)
    xq = qt.quantize_activation(xf, qt.qint8, scale)
    assert isinstance(xq, ActivationQBytesArray)
    ref = np.asarray(xq.dequantize()) @ np.asarray(g.dequantize()).T
    ops_config.set_backend(pallas_qbits=True)
    try:
        out = qlinear(xq, t)
    finally:
        ops_config.set_backend()
    a, b = np.asarray(out).ravel(), ref.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 1 - 1e-4, cos


def test_aligned_shapes_stay_unpadded():
    g = _gen(256, 1024, 128)
    t = WeightQBitsTpuArray.from_generic(g)
    assert t is not None and t.pad is None


def test_module_freeze_picks_padded_layout():
    """QLinear at GPT-OSS dims freezes onto the padded kernel layout and its
    forward matches the float reference within int4 tolerance."""
    from flax import nnx

    class Wrap(nnx.Module):
        def __init__(self):
            self.lin = nnx.Linear(2880, 512, use_bias=True,
                                  param_dtype=jnp.float32, rngs=nnx.Rngs(0))

        def __call__(self, x):
            return self.lin(x)

    m = Wrap()
    x = jnp.asarray(np.random.RandomState(3).randn(2, 2880) * 0.3, jnp.float32)
    ref = m(x)
    qt.quantize(m, weights="qint4")
    assert m.lin.weight_group_size == 96  # the reference auto rule
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(m)
        w = m.lin.weight.get_value()
        assert isinstance(w, WeightQBitsTpuArray) and w.pad is not None
        out = m(x)
    finally:
        ops_config.set_backend()
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos
