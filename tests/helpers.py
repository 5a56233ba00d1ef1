"""Shared test helpers (cosine-similarity oracle, random quantized inputs).

Mirrors the reference test strategy (`tests/helpers.py:54-99`): assert that
quantized results are ~colinear with the float reference instead of allclose,
with per-dtype tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quanto_tpu import (
    AbsmaxOptimizer,
    MaxOptimizer,
    quantize_activation,
    quantize_weight,
)


def random_tensor(shape, dtype=jnp.float32, key=None, scale=1.0):
    if key is None:
        key = jax.random.PRNGKey(0)
    # Same spirit as the reference generator: uniform in [-scale, scale].
    return (jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0) * scale).astype(dtype)


def random_qactivation(shape, qtype, dtype=jnp.float32, key=None):
    t = random_tensor(shape, dtype, key)
    scale = AbsmaxOptimizer()(t, qtype, None)
    return quantize_activation(t, qtype, scale)


def random_qweight(shape, qtype, dtype=jnp.float32, axis=0, group_size=None, key=None):
    t = random_tensor(shape, dtype, key)
    if qtype.bits == 8:
        scale = AbsmaxOptimizer()(t, qtype, axis)
        return quantize_weight(t, qtype, axis, scale)
    scale, shift = MaxOptimizer()(t, qtype, axis=axis, group_size=group_size)
    return quantize_weight(t, qtype, axis, scale, shift=shift, group_size=group_size)


def assert_similar(a, b, atol=None, rtol=None):
    """Verify that a and b are ~equal: same finiteness, cosine sim ~ 1."""
    a = np.asarray(jax.device_get(a), dtype=np.float32)
    b = np.asarray(jax.device_get(b), dtype=np.float32)
    assert a.shape == b.shape
    assert np.all(np.isfinite(a) == np.isfinite(b))
    if rtol is None:
        rtol = 1e-5
    atol = atol or 1e-6
    sim = np.dot(a.flatten(), b.flatten()) / (
        np.linalg.norm(a.flatten()) * np.linalg.norm(b.flatten()) + 1e-12
    )
    assert sim > 1 - rtol, f"Alignment {sim:.8f} deviates from 1.0 with rtol {rtol}"
