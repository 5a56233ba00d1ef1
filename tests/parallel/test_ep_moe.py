"""Expert-parallel MoE dispatch on the virtual 8-device CPU mesh.

Oracle: the dense-mask MoE block itself (every expert on every device). With
capacity_factor=None the capacity-dispatch shard_map formulation computes the
exact same function, so outputs must match to accumulation-order tolerance;
with a finite capacity factor overflow tokens are dropped, which we verify
degrades gracefully (finite outputs, still close on uniform routing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM, MixtralSparseMoeBlock
from quanto_tpu.models.qwen2_moe import Qwen2MoeConfig, Qwen2MoeSparseBlock
from quanto_tpu.parallel import make_mesh
from quanto_tpu.parallel.moe import EPSparseMoeBlock, convert_moe_to_ep


def _mixtral_config(**kw):
    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("intermediate_size", 128)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 8)
    kw.setdefault("num_key_value_heads", 4)
    kw.setdefault("max_position_embeddings", 64)
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("num_local_experts", 8)
    kw.setdefault("num_experts_per_tok", 2)
    return MixtralConfig(**kw)


def _block_and_input(seed=0):
    config = _mixtral_config()
    block = MixtralSparseMoeBlock(config, rngs=nnx.Rngs(seed))
    x = jnp.asarray(np.random.RandomState(seed).randn(2, 8, 64), jnp.float32)
    return config, block, x


def test_ep_block_exact_match_float():
    _, block, x = _block_and_input()
    ref = block(x)
    mesh = make_mesh({"ep": 8})
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    out = ep_block(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ep_block_sharded_weights():
    _, block, _ = _block_and_input()
    mesh = make_mesh({"ep": 4}, jax.devices()[:4])
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    from jax.sharding import PartitionSpec as P

    stacked = ep_block.proj_gate.data.get_value()
    assert stacked.shape[0] == 8
    assert stacked.sharding.spec == P("ep", None, None)


def test_ep_block_exact_match_quantized_int8():
    _, block, x = _block_and_input()
    qt.quantize(block, weights="qint8")
    qt.freeze(block)
    ref = block(x)
    mesh = make_mesh({"ep": 8})
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    # Expert payloads stacked as int8 with congruent scales.
    assert ep_block.proj_gate.kind == "qbytes"
    assert ep_block.proj_gate.data.get_value().dtype == jnp.int8
    out = ep_block(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ep_block_exact_match_quantized_int4():
    config = _mixtral_config(hidden_size=256, intermediate_size=256)
    block = MixtralSparseMoeBlock(config, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 256), jnp.float32)
    qt.quantize(block, weights="qint4")
    qt.freeze(block)
    ref = block(x)
    mesh = make_mesh({"ep": 8})
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    assert ep_block.proj_gate.kind in ("qbits_tpu", "float")
    out = ep_block(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_capacity_drop_runs():
    _, block, x = _block_and_input()
    mesh = make_mesh({"ep": 8})
    # capacity_factor=0 floors at capacity>=1: heavy token dropping, but the
    # computation must stay well-formed.
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=1e-6)
    out = ep_block(x)
    assert np.isfinite(np.asarray(out)).all()
    ref = block(x)
    # With batch*seq=16 tokens over 8 experts, capacity 1-2 still routes a
    # good share; outputs correlate but need not match.
    assert np.linalg.norm(np.asarray(out)) > 0


def test_ep_block_under_jit():
    _, block, x = _block_and_input()
    qt.quantize(block, weights="qint8")
    qt.freeze(block)
    ref = block(x)
    mesh = make_mesh({"ep": 8})
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    graphdef, state = nnx.split(ep_block)

    @jax.jit
    def f(state, x):
        m = nnx.merge(graphdef, state)
        return m(x)

    out = f(state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_convert_model_to_ep_mixtral():
    config = _mixtral_config()
    model = MixtralForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 8)), jnp.int32)
    ref, _ = model(ids)
    mesh = make_mesh({"ep": 8})
    n = convert_moe_to_ep(model, mesh, capacity_factor=None)
    assert n == config.num_hidden_layers
    assert isinstance(model.model.layers[0].block_sparse_moe, EPSparseMoeBlock)
    out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_convert_qwen2_moe_block_with_shared_expert():
    config = Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        shared_expert_intermediate_size=128, norm_topk_prob=False,
    )
    block = Qwen2MoeSparseBlock(config, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 64), jnp.float32)
    qt.quantize(block, weights="qint8")
    qt.freeze(block)
    ref = block(x)
    mesh = make_mesh({"ep": 8})
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    assert ep_block.shared_expert is not None
    assert ep_block.norm_topk_prob is False
    out = ep_block(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ep_requires_divisible_experts():
    _, block, _ = _block_and_input()
    mesh = make_mesh({"ep": 8})
    block.experts = nnx.List(list(block.experts)[:6])
    block.num_experts = 6
    with pytest.raises(ValueError):
        EPSparseMoeBlock(block, mesh)


def test_ep_block_kernel_dispatch_qbits():
    """With pallas-frozen sub-byte experts the dispatch routes through the
    stacked MoE kernels (`ops/pallas/moe_mm`, interpret mode here) INSIDE
    shard_map — the expert index lives in the kernel grid, no per-expert
    XLA slices. Exact vs dense-mask at capacity_factor=None; both the
    all-experts (cap >= S) and capacity-gather (cap < S) branches."""
    from quanto_tpu.ops import config as ops_config

    config = _mixtral_config(hidden_size=256, intermediate_size=256)
    block = MixtralSparseMoeBlock(config, rngs=nnx.Rngs(0))
    qt.quantize(block, weights="qint4")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(block)
    finally:
        ops_config.set_backend()
    mesh = make_mesh({"ep": 8})
    # cap >= S branch (B=1, T=8 -> S=8, cf=None -> cap=8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 256) * 0.3, jnp.float32)
    ref = block(x)
    ep_block = EPSparseMoeBlock(block, mesh, capacity_factor=None)
    assert ep_block.proj_gate.kind == "qbits_tpu"
    np.testing.assert_allclose(
        np.asarray(ep_block(x)), np.asarray(ref), atol=2e-3, rtol=2e-3
    )
    # cap < S branch (S=64, cf=2.0 -> cap=32)
    x2 = jnp.asarray(np.random.RandomState(1).randn(2, 32, 256) * 0.3, jnp.float32)
    ref2 = block(x2)
    ep2 = EPSparseMoeBlock(block, mesh, capacity_factor=2.0)
    assert ep2._capacity(64) < 64
    a, b = np.asarray(ep2(x2)).ravel(), np.asarray(ref2).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.95, cos
