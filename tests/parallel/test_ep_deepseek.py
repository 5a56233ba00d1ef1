"""DeepSeek-V3-scale expert parallelism on the virtual 8-device CPU mesh
(VERDICT round-4 #4): 256 routed experts (sigmoid/group router, top-8) +
shared experts, stacked sub-byte arrays sharded over "ep" — exact logits vs
the dense single-device model, per-device expert byte counts, and the
per-shard SELECTIVE decode path at S*top_k << E.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models.deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM
from quanto_tpu.ops import config as ops_config
from quanto_tpu.parallel import EPDeepseekMoE, convert_moe_to_ep, make_mesh


@pytest.fixture(scope="module")
def v3_model():
    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, q_lora_rank=32, kv_lora_rank=32,
        qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=256, n_group=8, topk_group=4, num_experts_per_tok=8,
        n_shared_experts=1, first_k_dense_replace=1, dtype=jnp.float32,
    )
    model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    return model


def test_v3_ep_exact_logits_and_shard_bytes(v3_model):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 5)), jnp.int32)
    ref, _ = v3_model(ids)
    mesh = make_mesh({"ep": 8})
    n = convert_moe_to_ep(v3_model, mesh, capacity_factor=None)
    assert n == 1  # layer 0 dense (first_k_dense_replace)
    blk = v3_model.model.layers[1].mlp
    assert isinstance(blk, EPDeepseekMoE)
    try:
        # Per-device expert slabs: each device holds exactly E/ep experts'
        # packed bytes for every projection leaf.
        from jax.sharding import PartitionSpec as P

        for proj in (blk.proj_gate, blk.proj_up, blk.proj_down):
            for leaf in proj.leaves():
                assert leaf.shape[0] == 256
                assert leaf.sharding.spec[0] == "ep", leaf.sharding
                shard_bytes = {s.data.nbytes for s in leaf.addressable_shards}
                assert shard_bytes == {leaf.nbytes // 8}, shard_bytes

        out, _ = v3_model(ids)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2
        )
    finally:
        # Restore the dense block for the other module-scoped tests.
        pass


def test_v3_ep_selective_decode_path(v3_model):
    """Single-token decode (S*K = 8 << E = 256): the per-shard selective
    kernel path must engage (gate/up/down = 3 sel calls per shard trace) and
    match the module-level math."""
    from quanto_tpu.ops.pallas import moe_mm

    blk = v3_model.model.layers[1].mlp
    if not isinstance(blk, EPDeepseekMoE):
        mesh = make_mesh({"ep": 8})
        convert_moe_to_ep(v3_model, mesh, capacity_factor=None)
        blk = v3_model.model.layers[1].mlp
    x1 = jnp.asarray(np.random.RandomState(1).randn(1, 1, 256) * 0.3, jnp.float32)

    calls = []
    orig = moe_mm.qbits_moe_sel_call

    def counting(*a, **kw):
        out = orig(*a, **kw)
        calls.append(out is not None)
        return out

    moe_mm.qbits_moe_sel_call = counting
    try:
        y = blk(x1)
    finally:
        moe_mm.qbits_moe_sel_call = orig
    assert calls and all(calls), calls  # sel path engaged, never fell off
    assert len(calls) == 3  # gate/up/down, one shard_map trace
    assert y.shape == x1.shape and bool(jnp.all(jnp.isfinite(y)))

    # Oracle: per-pair dequantized matmul math on the module's own router.
    top_i, top_p = blk._route(x1)
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray

    def deq(proj, e):
        return np.asarray(
            WeightQBitsTpuArray(
                _packed=proj.data.get_value()[e], _scale_t=proj.scale.get_value()[e],
                _shift_t=proj.shift.get_value()[e], qtype=proj.qtype,
                group_size=proj.group_size, orig_shape=proj.orig_shape,
                float_dtype=proj.float_dtype, k_shards=1,
            ).dequantize(),
            np.float32,
        )

    xf = np.asarray(x1, np.float32).reshape(1, 256)
    acc = np.zeros((1, 256), np.float32)
    for k in range(8):
        e = int(top_i[0, k])
        g = xf @ deq(blk.proj_gate, e).T
        u = xf @ deq(blk.proj_up, e).T
        d = (g / (1 + np.exp(-g)) * u) @ deq(blk.proj_down, e).T
        acc += float(top_p[0, k]) * d
    from quanto_tpu.tensor.qarray import QArray

    shared = blk.shared_experts(x1)
    if isinstance(shared, QArray):
        shared = shared.dequantize()
    ref = acc.reshape(1, 1, 256) + np.asarray(shared, np.float32)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-2, rtol=2e-2)
