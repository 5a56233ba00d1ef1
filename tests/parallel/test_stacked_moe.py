"""Stacked-expert MoE dispatch through the Pallas MoE kernels
(`parallel.StackedSparseMoeBlock` + `ops/pallas/moe_mm`, interpret mode on
CPU).

Oracle: the dense-mask block over the SAME frozen int4 weights. The
selective path (S*top_k < E) computes exactly the routed (token, expert)
pairs, so with top-k routing it matches dense-mask to kernel tolerance; the
all-experts and capacity-prefill paths are the dense-mask math reorganized.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models.mixtral import MixtralConfig, MixtralSparseMoeBlock
from quanto_tpu.ops import config as ops_config
from quanto_tpu.parallel import StackedSparseMoeBlock, convert_moe_to_stacked


def _block_and_input(B, T, seed=0):
    # Kernel-envelope shapes: H/I multiples of 128, group_size 128.
    config = MixtralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
        num_local_experts=8, num_experts_per_tok=2,
    )
    block = MixtralSparseMoeBlock(config, rngs=nnx.Rngs(seed))
    qt.quantize(block, weights="qint4")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(block)
    finally:
        ops_config.set_backend()
    x = jnp.asarray(np.random.RandomState(seed).randn(B, T, 256) * 0.3, jnp.float32)
    return block, x


@pytest.mark.parametrize("B,T", [(1, 1), (2, 1)])
def test_selective_path_matches_dense(B, T):
    """S*top_k < E: the scalar-prefetched selective kernel streams only the
    routed experts and matches the dense-mask math."""
    block, x = _block_and_input(B, T)
    ref = block(x)
    sb = StackedSparseMoeBlock(block, capacity_factor=2.0)
    assert B * T * sb.top_k < sb.num_experts  # selective regime
    out = sb(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_all_experts_path_matches_dense():
    """cap >= S but S*top_k >= E: copy-free all-experts dispatch."""
    block, x = _block_and_input(8, 1)
    ref = block(x)
    sb = StackedSparseMoeBlock(block, capacity_factor=2.0)
    S = 8
    assert S * sb.top_k >= sb.num_experts and sb._capacity(S) >= S
    out = sb(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_prefill_capacity_path():
    """cap < S: batched-expert GEMM over gathered slabs; capacity_factor=None
    would be exact, a finite factor drops overflow tokens gracefully."""
    block, x = _block_and_input(2, 32)
    ref = block(x)
    sb = StackedSparseMoeBlock(block, capacity_factor=None)
    assert sb._capacity(64) >= 64  # cf=None: exact
    np.testing.assert_allclose(np.asarray(sb(x)), np.asarray(ref), atol=2e-3, rtol=2e-3)
    sb2 = StackedSparseMoeBlock(block, capacity_factor=1.5)
    assert sb2._capacity(64) < 64
    out2 = sb2(x)
    # Dropped-overflow output still correlates strongly with the exact one.
    a, b = np.asarray(out2).ravel(), np.asarray(ref).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.95, cos


def test_jit_and_converter():
    from quanto_tpu.models.mixtral import MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, dtype=jnp.float32,
        num_local_experts=4, num_experts_per_tok=2,
    )
    model = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 5)), jnp.int32)
    ref, _ = model(ids)
    n = convert_moe_to_stacked(model, capacity_factor=2.0)
    assert n == 2
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        out, _ = m(ids)
        return out

    out = fwd(state, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


def test_qwen3_moe_converter():
    from quanto_tpu.models.qwen3 import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64, dtype=jnp.float32,
        num_experts=4, num_experts_per_tok=2,
    )
    model = Qwen3MoeForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 5)), jnp.int32)
    ref, _ = model(ids)
    assert convert_moe_to_stacked(model) == 2
    out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2)


def test_requires_frozen_subbyte():
    block, _ = _block_and_input(1, 1)
    float_block = MixtralSparseMoeBlock(
        MixtralConfig(
            vocab_size=128, hidden_size=256, intermediate_size=512,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, dtype=jnp.float32,
            num_local_experts=4, num_experts_per_tok=2,
        ),
        rngs=nnx.Rngs(1),
    )
    with pytest.raises(ValueError, match="sub-byte"):
        StackedSparseMoeBlock(float_block)


def test_deepseek_moe_stacked_converter():
    """DeepSeek-V3's sigmoid/group-routed MoE through the stacked dispatch
    (StackedDeepseekMoE): selective decode at top-8-of-8+ shapes, shared
    experts preserved, logits match the dense-mask model."""
    from quanto_tpu.models.deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM
    from quanto_tpu.parallel import StackedDeepseekMoE

    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, q_lora_rank=32, kv_lora_rank=32,
        qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=16, n_group=4, topk_group=2, num_experts_per_tok=4,
        n_shared_experts=1, first_k_dense_replace=1, dtype=jnp.float32,
    )
    model = DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 5)), jnp.int32)
    ref, _ = model(ids)
    n = convert_moe_to_stacked(model, capacity_factor=2.0)
    assert n == 1  # layer 0 is dense (first_k_dense_replace)
    assert isinstance(model.model.layers[1].mlp, StackedDeepseekMoE)
    out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2)
    # Single-token decode (S*K = 4 < E = 16): the SELECTIVE regime.
    blk = model.model.layers[1].mlp
    x1 = jnp.asarray(np.random.RandomState(1).randn(1, 1, 256) * 0.3, jnp.float32)
    assert 1 * blk.top_k < blk.num_experts and blk.top_k <= 8
    y = blk(x1)
    assert y.shape == x1.shape and bool(jnp.all(jnp.isfinite(y)))


def test_selective_widened_regime_matches_oracle():
    """nsel in (9..32] — the widened selective regime (_SEL_MAX=32,
    ceil8(nsel) row padding + diagonal extraction) must match the direct
    per-pair matmul oracle; guards the B=2/B=4 DeepSeek-shape results."""
    from quanto_tpu.ops.pallas import moe_mm
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray

    rng = np.random.RandomState(0)
    E, N, K = 16, 256, 256
    ws = []
    for _ in range(E):
        w = jnp.asarray(rng.randn(N, K) * 0.1, jnp.float32)
        s, z = qt.MaxOptimizer()(w, qt.qint4, axis=0, group_size=128)
        ws.append(qt.quantize_weight(w, qt.qint4, 0, s, shift=z, group_size=128))
    tpus = [WeightQBitsTpuArray.from_generic(q) for q in ws]
    p3 = jnp.stack([t._packed for t in tpus])
    s3 = jnp.stack([t._scale_t for t in tpus])
    z3 = jnp.stack([t._shift_t for t in tpus])
    for nsel in (9, 18, 30):
        x = jnp.asarray(rng.randn(nsel, K) * 0.3, jnp.float32)
        eids = jnp.asarray(rng.randint(0, E, nsel), jnp.int32)
        out = moe_mm.qbits_moe_sel_call(
            x, eids, p3, s3, z3, 4, 128, interpret=True
        )
        assert out is not None, nsel
        for i in range(nsel):
            ref = np.asarray(x[i]) @ np.asarray(ws[int(eids[i])].dequantize()).T
            np.testing.assert_allclose(
                np.asarray(out[i]), ref, atol=2e-3, rtol=2e-3,
                err_msg=f"nsel={nsel} i={i}",
            )
    # over the cap: graceful None (caller falls back)
    x = jnp.asarray(rng.randn(33, K), jnp.float32)
    assert moe_mm.qbits_moe_sel_call(
        x, jnp.zeros(33, jnp.int32), p3, s3, z3, 4, 128, interpret=True
    ) is None


def test_uniq_boundary_dedup_both_branches():
    """The boundary dedup route (E <= S*K <= 2E): a lax.cond streams only
    U = 3E/4 unique expert payloads when the step's routing has <= U unique
    experts, else the full all-experts route. Both branches must be exact
    vs the XLA dense fallback on the same quantized weights."""
    block, x = _block_and_input(8, 1)  # S=8, K=2, E=8 -> S*K = 2E boundary
    sb = StackedSparseMoeBlock(block, capacity_factor=2.0)
    E, K, S, H = sb.num_experts, sb.top_k, 8, 256
    xf = x.reshape(S, H)
    rng = np.random.RandomState(7)

    def oracle(top_i, top_p):
        mask = np.zeros((S, E), np.float32)
        for s in range(S):
            for k in range(K):
                mask[s, top_i[s, k]] += top_p[s, k]
        return sb._dense_fallback(xf, jnp.asarray(mask))

    ops_config.set_backend(pallas_qbits=True)
    try:
        # (a) <= U unique experts -> uniq branch taken at runtime.
        top_i = jnp.asarray(rng.randint(0, 4, (S, K)), jnp.int32)  # 4 unique
        top_i = top_i.at[:, 1].set((top_i[:, 0] + 1) % 4)  # distinct per row
        top_p = jnp.asarray(rng.rand(S, K).astype(np.float32) * 0.5 + 0.25)
        out = sb._dispatch(x, top_i, top_p)
        ref = oracle(np.asarray(top_i), np.asarray(top_p))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)

        # (b) all 8 experts routed -> all branch taken at runtime.
        top_i = jnp.stack(
            [jnp.arange(8, dtype=jnp.int32), (jnp.arange(8, dtype=jnp.int32) + 1) % 8],
            axis=1,
        )
        out = sb._dispatch(x, top_i, top_p)
        ref = oracle(np.asarray(top_i), np.asarray(top_p))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)
    finally:
        ops_config.set_backend()
