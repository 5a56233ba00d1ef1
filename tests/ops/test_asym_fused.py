"""Fused asymmetric-KV shift epilogue (`ops/config.use_asym_fused`,
VERDICT round-4 weak #5): the fused formulation (chain-dtype k-term, einsum
v-correction) must match the reference side-pass formulation — exactly in
the f32 chain, to chain rounding under bf16.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.attention import gqa_attention
from quanto_tpu.tensor.kv_cache import (
    init_quantized_kv_cache,
    kv_read_raw,
    kv_update,
)


def _attn(q5, layer, lengths, fused: bool, bf16: bool):
    kd, vd, ks, vs, km, vm = kv_read_raw(layer, q5.dtype)
    S = kd.shape[1]
    mask = jnp.where(
        jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None],
        0.0, jnp.finfo(jnp.float32).min,
    )
    ops_config.set_backend(asym_fused=fused, bf16_softmax=bf16)
    try:
        return gqa_attention(
            q5, kd, vd, mask, q5.shape[-1] ** -0.5,
            k_scale=ks, v_scale=vs, k_shift=km, v_shift=vm,
        )
    finally:
        ops_config.set_backend()


@pytest.mark.parametrize("spec", ["qint4a", "k8v4a", "qint8a"])
def test_fused_matches_side_pass_f32(spec):
    rng = np.random.RandomState(0)
    B, S, Hkv, G, D = 2, 64, 2, 2, 32
    (layer,) = init_quantized_kv_cache(1, B, S, Hkv, D, spec)
    k = jnp.asarray(rng.randn(B, S, Hkv, D) + 0.7, jnp.float32)  # nonzero mean
    v = jnp.asarray(rng.randn(B, S, Hkv, D) - 0.4, jnp.float32)
    layer = kv_update(layer, k, v, 0)
    assert layer._k_shift is not None  # asymmetric spec sanity
    q5 = jnp.asarray(rng.randn(B, 1, Hkv, G, D), jnp.float32)
    lengths = jnp.asarray([40, 64], jnp.int32)
    ref = _attn(q5, layer, lengths, fused=False, bf16=False)
    out = _attn(q5, layer, lengths, fused=True, bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_matches_side_pass_bf16_chain():
    rng = np.random.RandomState(1)
    B, S, Hkv, G, D = 1, 64, 2, 2, 32
    (layer,) = init_quantized_kv_cache(1, B, S, Hkv, D, "qint4a")
    k = jnp.asarray(rng.randn(B, S, Hkv, D) + 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, D) + 0.3, jnp.float32)
    layer = kv_update(layer, k, v, 0)
    q5 = jnp.asarray(rng.randn(B, 1, Hkv, G, D), jnp.bfloat16)
    lengths = jnp.asarray([64], jnp.int32)
    ref = _attn(q5, layer, lengths, fused=False, bf16=True)
    out = _attn(q5, layer, lengths, fused=True, bf16=True)
    a = np.asarray(out, np.float32).ravel()
    b = np.asarray(ref, np.float32).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 1 - 1e-4, cos
