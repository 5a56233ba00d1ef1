"""Context (sequence) parallelism: KV sharded along S with a distributed
online softmax. Oracle: the single-shard `ops/attention.gqa_attention`."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quanto_tpu.ops.attention import gqa_attention
from quanto_tpu.parallel import cp_decode_attention, make_mesh, shard_cache_seq
from quanto_tpu.tensor.kv_cache import init_quantized_kv_cache, kv_update


def _mask_from_lengths(lengths, S):
    k_pos = jnp.arange(S)
    return jnp.where(
        k_pos[None, None, None, :] < lengths[:, None, None, None],
        0.0, jnp.finfo(jnp.float32).min,
    )


@pytest.mark.parametrize("sp", [2, 8])
def test_cp_matches_single_device_float(sp):
    rng = np.random.RandomState(0)
    B, S, Hkv, G, D = 2, 64, 2, 2, 16
    q5 = jnp.asarray(rng.randn(B, 1, Hkv, G, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    lengths = jnp.asarray([37, 64], jnp.int32)
    scale = D**-0.5
    ref = gqa_attention(q5, k, v, _mask_from_lengths(lengths, S), scale)

    mesh = make_mesh({"sp": sp, "x": 8 // sp})
    cache = shard_cache_seq((k, v), mesh, "sp")
    out = cp_decode_attention(q5, cache, lengths, scale, mesh, "sp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("kv_quant", ["qint8", "qint4", "k8v4", "qint4a"])
def test_cp_matches_single_device_quantized(kv_quant):
    rng = np.random.RandomState(1)
    B, S, Hkv, G, D = 2, 64, 2, 2, 16
    q5 = jnp.asarray(rng.randn(B, 1, Hkv, G, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    (layer,) = init_quantized_kv_cache(1, B, S, Hkv, D, kv_quant)
    layer = kv_update(layer, k, v, 0)
    lengths = jnp.asarray([50, 64], jnp.int32)
    scale = D**-0.5
    from quanto_tpu.tensor.kv_cache import kv_read_raw

    kd, vd, ks, vs, km, vm = kv_read_raw(layer, q5.dtype)
    ref = gqa_attention(
        q5, kd, vd, _mask_from_lengths(lengths, S), scale,
        k_scale=ks, v_scale=vs, k_shift=km, v_shift=vm,
    )

    mesh = make_mesh({"sp": 4, "x": 2})
    sharded = shard_cache_seq(layer, mesh, "sp")
    out = cp_decode_attention(q5, sharded, lengths, scale, mesh, "sp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cp_under_jit():
    rng = np.random.RandomState(2)
    B, S, Hkv, G, D = 1, 32, 2, 1, 8
    q5 = jnp.asarray(rng.randn(B, 1, Hkv, G, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
    lengths = jnp.asarray([20], jnp.int32)
    mesh = make_mesh({"sp": 8})
    cache = shard_cache_seq((k, v), mesh, "sp")
    f = jax.jit(
        lambda q, le: cp_decode_attention(q, cache, le, D**-0.5, mesh, "sp")
    )
    ref = gqa_attention(q5, k, v, _mask_from_lengths(lengths, S), D**-0.5)
    np.testing.assert_allclose(np.asarray(f(q5, lengths)), np.asarray(ref), atol=2e-5)
