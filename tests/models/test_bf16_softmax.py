"""bf16 attention softmax chain (`ops/attention.gqa_attention`,
`set_backend(bf16_softmax=True)`): fidelity vs the f32 chain, flag gating,
and the alibi/softcap transform order."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.ops import config as ops_config
from quanto_tpu.ops.attention import gqa_attention


@pytest.fixture
def bf16_model():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.bfloat16,
    )
    return LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))


def _decode_logits(model, ids):
    cache = init_kv_cache(model.config, ids.shape[0], 16, kv_quant="qint8")
    logits, cache = model(ids[:, :6], cache, 0)
    outs = [logits[:, -1]]
    for t in range(6, ids.shape[1]):
        step, cache = model(ids[:, t : t + 1], cache, t)
        outs.append(step[:, 0])
    return jnp.stack(outs, 1).astype(jnp.float32)


def test_bf16_softmax_close_to_f32(bf16_model):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 10)), jnp.int32)
    try:
        ops_config.set_backend(bf16_softmax=False)
        ref = _decode_logits(bf16_model, ids)
        ops_config.set_backend(bf16_softmax=True)
        got = _decode_logits(bf16_model, ids)
    finally:
        ops_config.set_backend()
    # Same bf16 model, only the softmax-chain dtype differs: next-token
    # distributions must stay near-identical.
    p = jax.nn.softmax(ref, -1)
    q = jax.nn.softmax(got, -1)
    kl = float(jnp.mean(jnp.sum(p * (jnp.log(p + 1e-9) - jnp.log(q + 1e-9)), -1)))
    assert kl < 1e-3, kl
    assert float(jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(got, -1))) >= 0.9


def test_f32_model_ignores_flag():
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=32, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 64, (1, 5)), jnp.int32)
    try:
        ops_config.set_backend(bf16_softmax=False)
        ref, _ = model(ids)
        ops_config.set_backend(bf16_softmax=True)
        got, _ = model(ids)
    finally:
        ops_config.set_backend()
    # f32 activations never take the bf16 chain: bit-identical.
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("use_bf16", [False, True])
def test_gqa_attention_alibi_softcap_order(use_bf16):
    """Reference-check the helper's (+alibi) -> *scale -> softcap -> +mask
    order against a hand-rolled f32 implementation."""
    rng = np.random.RandomState(2)
    B, T, Hkv, G, D, S = 2, 1, 2, 2, 8, 12
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    q5 = jnp.asarray(rng.randn(B, T, Hkv, G, D), dt)
    k = jnp.asarray(rng.randn(B, S, Hkv, D), dt)
    v = jnp.asarray(rng.randn(B, S, Hkv, D), dt)
    mask = jnp.asarray(rng.choice([0.0, float(jnp.finfo(jnp.float32).min)], (B, 1, T, S), p=[0.8, 0.2]))
    mask = mask.at[..., 0].set(0.0)
    alibi = jnp.asarray(rng.randn(B, Hkv * G, S), jnp.float32) * 0.1
    scale, cap = D**-0.5, 5.0

    lg = np.einsum(
        "bqhgd,bkhd->bhgqk", np.asarray(q5, np.float32), np.asarray(k, np.float32)
    )
    lg = (lg + np.asarray(alibi).reshape(B, Hkv, G, 1, S)) * scale
    lg = np.tanh(lg / cap) * cap
    lg = lg + np.asarray(mask)[:, :, None]
    w = np.exp(lg - lg.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("bhgqk,bkhd->bqhgd", w, np.asarray(v, np.float32)).reshape(B, T, -1)

    try:
        ops_config.set_backend(bf16_softmax=use_bf16)
        got = gqa_attention(q5, k, v, mask, scale, softcap=cap, alibi=alibi)
    finally:
        ops_config.set_backend()
    tol = 5e-2 if use_bf16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=tol, atol=tol)
