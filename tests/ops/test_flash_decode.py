"""Flash-decode Pallas kernel vs the XLA einsum attention path (interpret
mode on CPU — the same oracle style as the reference's kernel tests,
`tests/library/test_mm.py:27-49`: fused kernel vs the unfused math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quanto_tpu.ops.pallas.flash_decode import flash_decode_call


def _reference(q, k, v, ks, vs, pos):
    """The model's einsum decode attention (llama.py), f32 math."""
    B, Hkv, G, D = q.shape
    S = k.shape[1]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhgd,bkhd->bhgk", qf, kf)
    if ks is not None:
        logits = logits * jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, :]
    mask = jnp.where(
        jnp.arange(S)[None, :] <= pos[:, None], 0.0, -1e30
    )[:, None, None, :]
    logits = logits * (D ** -0.5) + mask
    probs = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        probs = probs * jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, :]
    return jnp.einsum("bhgk,bkhd->bhgd", probs, vf)


def _inputs(B=2, Hkv=2, G=4, S=256, D=128, quantized=True, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, Hkv, G, D), jnp.float32)
    if quantized:
        k = jnp.asarray(rng.randint(-127, 128, (B, S, Hkv, D)), jnp.int8)
        v = jnp.asarray(rng.randint(-127, 128, (B, S, Hkv, D)), jnp.int8)
        ks = jnp.asarray(rng.rand(B, S, Hkv, 1) * 0.02 + 0.001, jnp.float32)
        vs = jnp.asarray(rng.rand(B, S, Hkv, 1) * 0.02 + 0.001, jnp.float32)
    else:
        k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
        ks = vs = None
    return q, k, v, ks, vs


@pytest.mark.parametrize("D", [64, 128], ids=["d64", "d128"])
@pytest.mark.parametrize("quantized", [True, False], ids=["int8cache", "floatcache"])
def test_flash_decode_matches_einsum(quantized, D):
    # D=64 exercises the head-group packing (HG=8 kv heads per block).
    q, k, v, ks, vs = _inputs(quantized=quantized, Hkv=8 if D == 64 else 2, D=D)
    pos = jnp.asarray([255, 93], jnp.int32)  # full and ragged fill
    out = flash_decode_call(q, k, v, ks, vs, pos, interpret=True)
    assert out is not None
    ref = _reference(q, k, v, ks, vs, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_decode_masking_ignores_stale_slots():
    """Slots beyond pos must not influence the output at all."""
    q, k, v, ks, vs = _inputs(B=1, Hkv=1, G=1, S=128)
    pos = jnp.asarray([40], jnp.int32)
    out1 = flash_decode_call(q, k, v, ks, vs, pos, interpret=True)
    # Corrupt every slot past pos.
    k2 = k.at[:, 41:].set(127)
    v2 = v.at[:, 41:].set(-127)
    out2 = flash_decode_call(q, k2, v2, ks, vs, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_flash_decode_gqa_group_padding():
    """G not a multiple of 8 pads internally and slices back."""
    q, k, v, ks, vs = _inputs(G=3, S=128)
    pos = jnp.asarray([127, 60], jnp.int32)
    out = flash_decode_call(q, k, v, ks, vs, pos, interpret=True)
    ref = _reference(q, k, v, ks, vs, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_decode_rejects_out_of_envelope():
    q, k, v, ks, vs = _inputs(S=192)  # S % 128 != 0
    pos = jnp.asarray([10, 10], jnp.int32)
    assert flash_decode_call(q, k, v, ks, vs, pos, interpret=True) is None
    q, k, v, ks, vs = _inputs(D=128, S=128)
    fp8 = k.astype(jnp.float8_e4m3fn)
    assert flash_decode_call(q, fp8, v, ks, vs, pos, interpret=True) is None


def test_model_decode_with_flash_kernel_matches_einsum_path():
    """End-to-end: a tiny llama decode step with the kernel forced on
    (interpret) equals the einsum path."""
    from flax import nnx

    from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.ops import config as ops_config

    config = LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 4)), jnp.int32)
    for kv_quant in (None, "qint8"):
        cache = init_kv_cache(config, 2, 128, kv_quant=kv_quant)
        _, cache = model(ids, cache, 0)
        tok = jnp.asarray([[7], [9]], jnp.int32)
        ref, _ = model(tok, cache, 4)
        ops_config.set_backend(flash_decode=True)
        try:
            out, _ = model(tok, cache, 4)
        finally:
            ops_config.set_backend()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("family", ["gpt2", "opt"])
def test_mha_model_decode_with_flash_kernel(family):
    """MHA families (gpt2/opt) route decode through the shared dispatch."""
    from quanto_tpu.ops import config as ops_config

    if family == "gpt2":
        from quanto_tpu.models import GPT2Config, GPT2LMHeadModel

        model = GPT2LMHeadModel(GPT2Config(
            vocab_size=64, n_positions=128, n_embd=128, n_layer=2, n_head=2,
        ))
    else:
        from quanto_tpu.models import OPTConfig, OPTForCausalLM

        model = OPTForCausalLM(OPTConfig(
            vocab_size=64, hidden_size=128, ffn_dim=128, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=128,
        ))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 4)), jnp.int32)
    cache = model.init_kv_cache(2, 128, jnp.float32)
    _, cache = model(ids, cache, 0)
    tok = jnp.asarray([[7], [9]], jnp.int32)
    ref, _ = model(tok, cache, 4)
    ops_config.set_backend(flash_decode=True)
    try:
        out, _ = model(tok, cache, 4)
    finally:
        ops_config.set_backend()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("D", [64, 128], ids=["d64", "d128"])
@pytest.mark.parametrize("quantized", [True, False], ids=["int8cache", "floatcache"])
def test_flash_decode2_matches_einsum(quantized, D):
    """v2 (full-row tile-aligned blocks, one grid step per batch element)."""
    from quanto_tpu.ops.pallas.flash_decode2 import flash_decode2_call

    q, k, v, ks, vs = _inputs(quantized=quantized, Hkv=8 if D == 64 else 2, D=D)
    pos = jnp.asarray([255, 93], jnp.int32)
    out = flash_decode2_call(q, k, v, ks, vs, pos, interpret=True)
    assert out is not None
    ref = _reference(q, k, v, ks, vs, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_decode2_envelope():
    from quanto_tpu.ops.pallas.flash_decode2 import flash_decode2_call

    # Hkv*D below one lane tile -> out of envelope (v1 handles via padding
    # rules or the dispatch falls back to the einsum path).
    q, k, v, ks, vs = _inputs(quantized=False, Hkv=1, G=4, D=64)
    pos = jnp.asarray([255, 93], jnp.int32)
    assert flash_decode2_call(q, k, v, ks, vs, pos, interpret=True) is None
