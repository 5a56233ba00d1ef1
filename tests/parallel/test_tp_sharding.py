"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh.

The torch reference has no distributed capability at all (SURVEY.md §2.10);
these tests validate the new TPU-native sharding layer: quantized weights and
their scales shard congruently, the jitted forward runs under a Mesh, and the
result matches the unsharded computation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

import quanto_tpu as qt
from quanto_tpu.models import LlamaConfig, LlamaForCausalLM
from quanto_tpu.models.llama import init_kv_cache
from quanto_tpu.parallel import LLAMA_TP_RULES, make_mesh, shard_kv_cache, shard_model


def _tiny_llama(dtype=jnp.float32):
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
        dtype=dtype,
    )
    return LlamaForCausalLM(config, rngs=nnx.Rngs(0))


def test_mesh_creation():
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3, "tp": 4})


def test_tp_sharded_quantized_forward_matches_unsharded():
    model = _tiny_llama()
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)

    # Scales must shard congruently with their payloads.
    qw = model.model.layers[0].self_attn.q_proj.weight.get_value()
    data_shard = qw._data.sharding
    scale_shard = qw._scale.sharding
    assert data_shard.spec == P("tp", None)
    assert scale_shard.spec == P("tp", None)
    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    assert down._data.sharding.spec == P(None, "tp")
    assert down._scale.sharding.spec == P(None, None)

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        return m(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_tp_sharded_decode_with_cache():
    model = _tiny_llama()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.array([[1, 5, 17, 99]] * 2, dtype=np.int64))
    full, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    cache = init_kv_cache(model.config, 2, 8, jnp.float32)
    cache = shard_kv_cache(cache, mesh)
    graphdef, state = nnx.split(model)

    @jax.jit
    def prefill(state, ids, cache):
        m = nnx.merge(graphdef, state)
        return m(ids, cache, 0)

    @jax.jit
    def step(state, tok, cache, pos):
        m = nnx.merge(graphdef, state)
        return m(tok, cache, pos)

    with mesh:
        logits, cache = prefill(state, ids[:, :3], cache)
        step_logits, cache = step(state, ids[:, 3:4], cache, 3)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :3]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(step_logits[:, 0]), np.asarray(full[:, 3]), rtol=1e-4, atol=1e-4)


def test_tp_sharded_decode_with_int4_cache():
    """The s4 KV cache shards and decodes under a dp x tp mesh (the payload's
    head axis splits over tp like the int8 cache's)."""
    model = _tiny_llama()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ids = jnp.asarray(np.array([[1, 5, 17, 99]] * 2, dtype=np.int64))
    full, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    cache = init_kv_cache(model.config, 2, 8, kv_quant="qint4")
    cache = shard_kv_cache(cache, mesh)
    assert cache[0]._k_data.dtype == jnp.int4
    graphdef, state = nnx.split(model)

    @jax.jit
    def prefill(state, ids, cache):
        m = nnx.merge(graphdef, state)
        return m(ids, cache, 0)

    @jax.jit
    def step(state, tok, cache, pos):
        m = nnx.merge(graphdef, state)
        return m(tok, cache, pos)

    with mesh:
        logits, cache = prefill(state, ids[:, :3], cache)
        step_logits, cache = step(state, ids[:, 3:4], cache, 3)
    # int4 cache: quantization error dominates -- gate on cosine, not allclose.
    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)

    assert cos(logits, full[:, :3]) > 0.99
    assert cos(step_logits[:, 0], full[:, 3]) > 0.99


def test_qat_training_step_dp_tp():
    """One QAT (fake-quant STE) training step over a dp x tp mesh."""
    model = _tiny_llama()
    qt.quantize(model, weights="qint8", exclude="lm_head")
    for _name, m in qt.named_qmodules(model):
        m.qat = True
    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    graphdef, state = nnx.split(model)
    params = state

    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]] * 4, dtype=np.int64))
    ids = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))

    def loss_fn(state, ids):
        m = nnx.merge(graphdef, state)
        logits, _ = m(ids)
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def train_step(state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(state, ids)
        new_state = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, state, grads)
        return loss, new_state

    with mesh:
        loss0, params = train_step(params, ids)
        loss1, params = train_step(params, ids)
    assert np.isfinite(float(loss0))
    assert float(loss1) < float(loss0)


def test_gpt2_tp_rules():
    from quanto_tpu.models import GPT2Config, GPT2LMHeadModel
    from quanto_tpu.parallel import GPT2_TP_RULES

    cfg = GPT2Config(vocab_size=128, n_positions=32, n_embd=64, n_layer=2, n_head=4)
    model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int64)
    ref, _ = model(ids)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    qref, _ = model(ids)
    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, GPT2_TP_RULES)
    c_attn = model.transformer.h[0].attn.c_attn.weight.get_value()
    assert c_attn._data.sharding.spec == P("tp", None)
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        return nnx.merge(graphdef, state)(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(qref), rtol=5e-5, atol=5e-5)


def test_tp_sharded_qbits_forward_matches_unsharded():
    """Sub-byte (int4 g128) weights in the TPU split-half layout shard along
    N for column-parallel projections; scales/shifts shard congruently."""
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray

    config = LlamaConfig(
        vocab_size=128,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    # Force the TPU kernel layout at freeze (off-TPU default keeps the
    # generic layout), then run the sharded forward on the XLA path.
    from quanto_tpu.ops import config as ops_config

    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)

    qw = model.model.layers[0].self_attn.q_proj.weight.get_value()
    assert isinstance(qw, WeightQBitsTpuArray)
    assert qw._packed.sharding.spec == P("tp", None)
    assert qw._scale_t.sharding.spec == P(None, "tp")
    assert qw._shift_t.sharding.spec == P(None, "tp")
    # Row-parallel sub-byte weights outside the block-local envelope
    # (here K=512: 512/2/4 = 64 packed cols/block < 128) replicate pad-free;
    # eligible shapes K-shard (test_tp_row_parallel_qbits_k_sharding).
    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    assert isinstance(down, WeightQBitsTpuArray)
    assert down._packed.sharding.spec in (P(), P(None, None))

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        return m(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_mixtral_tp_rules():
    from quanto_tpu.models import MixtralConfig, MixtralForCausalLM
    from quanto_tpu.parallel import MIXTRAL_TP_RULES

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = MixtralForCausalLM(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)
    qt.quantize(model, weights="qint8", exclude=["lm_head", "*gate"])
    qt.freeze(model)
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, MIXTRAL_TP_RULES)
    from jax.sharding import PartitionSpec as P2

    w1 = model.model.layers[0].block_sparse_moe.experts[0].w1.weight.get_value()
    assert w1._data.sharding.spec == P2("tp", None)
    w2 = model.model.layers[0].block_sparse_moe.experts[0].w2.weight.get_value()
    assert w2._data.sharding.spec == P2(None, "tp")

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        return m(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_tp_sharded_continuous_batching_int4_int8cache():
    """North-star serving topology (BASELINE.json config 5): int4
    tensor-sharded weights + int8 KV cache sharded over kv heads +
    continuous batching — engine results match the unsharded engine."""
    from quanto_tpu.models.serving import BatchedEngine
    from quanto_tpu.ops import config as ops_config

    config = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)  # TPU kernel layout (shardable split-half payloads)
    finally:
        ops_config.set_backend()

    prompts = [[1, 5, 17], [9, 2, 44, 7]]
    ref_engine = BatchedEngine(model, max_batch=2, max_len=32, kv_quant="qint8")
    ref = {}
    for p in prompts:
        ref[ref_engine.add(p, max_new_tokens=6)] = p
    ref_engine.run_to_completion()

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    engine = BatchedEngine(model, max_batch=2, max_len=32, kv_quant="qint8", mesh=mesh)
    from quanto_tpu.tensor.kv_cache import QKVCacheLayer
    from jax.sharding import PartitionSpec as P2

    assert isinstance(engine._cache[0], QKVCacheLayer)
    assert engine._cache[0]._k_data.sharding.spec == P2(None, None, "tp", None)
    assert engine._cache[0]._k_scale.sharding.spec == P2(None, None, "tp", None)
    out = {}
    for p in prompts:
        out[engine.add(p, max_new_tokens=6)] = p
    engine.run_to_completion()
    for rid in out:
        assert engine.result(rid) == ref_engine.result(rid), rid


def test_t5_tp_rules():
    """Encoder-decoder TP: quantized T5 sharded forward == unsharded."""
    from quanto_tpu.models import T5Config, T5ForConditionalGeneration
    from quanto_tpu.parallel import T5_TP_RULES

    config = T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dtype=jnp.float32,
    )
    model = T5ForConditionalGeneration(config, rngs=nnx.Rngs(0))
    enc_ids = jnp.asarray(np.random.RandomState(0).randint(0, 96, (2, 6)))
    dec_ids = jnp.asarray(np.random.RandomState(1).randint(0, 96, (2, 4)))
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    ref, _ = model(dec_ids, encoder_input_ids=enc_ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, T5_TP_RULES)
    qw = model.encoder.block[0].layer[0].SelfAttention.q.weight.get_value()
    assert qw._data.sharding.spec == P("tp", None)
    assert qw._scale.sharding.spec == P("tp", None)
    wo = model.decoder.block[0].layer[2].DenseReluDense.wo.weight.get_value()
    assert wo._data.sharding.spec == P(None, "tp")
    cross_q = model.decoder.block[0].layer[1].EncDecAttention.q.weight.get_value()
    assert cross_q._data.sharding.spec == P("tp", None)
    # relative_attention_bias stays replicated.
    rb = model.encoder.block[0].layer[0].SelfAttention.relative_attention_bias
    assert rb.embedding.get_value().sharding.spec == P()

    with mesh:
        out, _ = model(dec_ids, encoder_input_ids=enc_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_whisper_tp_rules():
    from quanto_tpu.models import WhisperConfig, WhisperForConditionalGeneration
    from quanto_tpu.parallel import WHISPER_TP_RULES

    config = WhisperConfig(
        vocab_size=120, num_mel_bins=8, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=16, max_target_positions=16,
        decoder_start_token_id=1, dtype=jnp.float32,
    )
    model = WhisperForConditionalGeneration(config, rngs=nnx.Rngs(0))
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32), jnp.float32)
    dec_ids = jnp.asarray(np.random.RandomState(1).randint(0, 120, (2, 4)))
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    ref, _ = model(dec_ids, input_features=feats)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, WHISPER_TP_RULES)
    qw = model.model.encoder.layers[0].self_attn.q_proj.weight.get_value()
    assert qw._data.sharding.spec == P("tp", None)
    fc2 = model.model.decoder.layers[0].fc2.weight.get_value()
    assert fc2._data.sharding.spec == P(None, "tp")
    # Conv frontend params stay replicated.
    assert model.model.encoder.conv1.weight.get_value().sharding.spec == P()

    with mesh:
        out, _ = model(dec_ids, input_features=feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_phi3_tp_rules():
    from quanto_tpu.models import Phi3Config, Phi3ForCausalLM
    from quanto_tpu.parallel import PHI3_TP_RULES

    config = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        dtype=jnp.float32,
    )
    model = Phi3ForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, PHI3_TP_RULES)
    qkv = model.model.layers[0].self_attn.qkv_proj.weight.get_value()
    assert qkv._data.sharding.spec == P("tp", None)
    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    assert down._data.sharding.spec == P(None, "tp")

    with mesh:
        out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gemma2_qwen3_use_llama_rules():
    from quanto_tpu.models import (
        Gemma2Config, Gemma2ForCausalLM, Qwen3Config, Qwen3ForCausalLM,
    )

    mesh = make_mesh({"dp": 2, "tp": 4})
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)

    g2 = Gemma2ForCausalLM(
        Gemma2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
            head_dim=8, query_pre_attn_scalar=8.0, sliding_window=4,
            dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    q3 = Qwen3ForCausalLM(
        Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
            head_dim=8, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    for model in (g2, q3):
        qt.quantize(model, weights="qint8", exclude="lm_head")
        qt.freeze(model)
        ref, _ = model(ids)
        shard_model(model, mesh, LLAMA_TP_RULES)
        qw = model.model.layers[0].self_attn.q_proj.weight.get_value()
        assert qw._data.sharding.spec == P("tp", None)
        with mesh:
            out, _ = model(ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_starcoder2_tp_rules():
    from quanto_tpu.models import Starcoder2Config, Starcoder2ForCausalLM
    from quanto_tpu.parallel import STARCODER2_TP_RULES

    config = Starcoder2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        dtype=jnp.float32,
    )
    model = Starcoder2ForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)
    qt.quantize(model, weights="qint8")
    qt.freeze(model)
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, STARCODER2_TP_RULES)
    cfc = model.model.layers[0].mlp.c_fc.weight.get_value()
    assert cfc._data.sharding.spec == P("tp", None)
    cproj = model.model.layers[0].mlp.c_proj.weight.get_value()
    assert cproj._data.sharding.spec == P(None, "tp")

    with mesh:
        out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_neox_and_falcon_tp_rules():
    from quanto_tpu.models import (
        FalconConfig, FalconForCausalLM, GPTNeoXConfig, GPTNeoXForCausalLM,
    )
    from quanto_tpu.parallel import FALCON_TP_RULES, NEOX_TP_RULES

    mesh = make_mesh({"dp": 2, "tp": 4})
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)), jnp.int32)

    neox = GPTNeoXForCausalLM(
        GPTNeoXConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    qt.quantize(neox, weights="qint8", exclude="embed_out")
    qt.freeze(neox)
    ref, _ = neox(ids)
    shard_model(neox, mesh, NEOX_TP_RULES)
    qkv = neox.gpt_neox.layers[0].attention.query_key_value.weight.get_value()
    assert qkv._data.sharding.spec == P("tp", None)
    dense = neox.gpt_neox.layers[0].attention.dense.weight.get_value()
    assert dense._data.sharding.spec == P(None, "tp")
    with mesh:
        out, _ = neox(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    falcon = FalconForCausalLM(
        FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=8, dtype=jnp.float32,
        ),
        rngs=nnx.Rngs(0),
    )
    qt.quantize(falcon, weights="qint8")
    qt.freeze(falcon)
    ref, _ = falcon(ids)
    shard_model(falcon, mesh, FALCON_TP_RULES)
    h4h = falcon.transformer.h[0].mlp.dense_h_to_4h.weight.get_value()
    assert h4h._data.sharding.spec == P("tp", None)
    d4h = falcon.transformer.h[0].mlp.dense_4h_to_h.weight.get_value()
    assert d4h._data.sharding.spec == P(None, "tp")
    with mesh:
        out, _ = falcon(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_sharded_engine_burst_and_batched_prefill():
    """Burst decode + batched chunked prefill under a dp x tp mesh: the new
    scanned-decode and pooled-chunk programs must compile with collectives
    and match the unsharded engine token-for-token."""
    from quanto_tpu.models.serving import BatchedEngine

    config = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    qt.quantize(model, weights="qint8", exclude="lm_head")
    qt.freeze(model)

    prompts = [[1, 5, 17, 8, 3], [9, 2, 44]]
    ref_engine = BatchedEngine(model, max_batch=2, max_len=32, prefill_chunk=4)
    rids = ref_engine.add_batch(prompts, max_new_tokens=6)
    ref_engine.run_to_completion(burst=4)
    refs = [ref_engine.result(r) for r in rids]

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    engine = BatchedEngine(
        model, max_batch=2, max_len=32, mesh=mesh, prefill_chunk=4
    )
    rids = engine.add_batch(prompts, max_new_tokens=6)
    engine.run_to_completion(burst=4)
    for rid, ref in zip(rids, refs):
        assert engine.result(rid) == ref


def test_tp_row_parallel_qbits_k_sharding():
    """Row-parallel sub-byte weights shard along K (block-local repack):
    per-device payload bytes divide by tp, scale-group rows shard
    congruently, and the sharded forward matches the unsharded one.
    (Round-1 gap: these payloads replicated — VERDICT.md 'What's weak' #1.)"""
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray
    from quanto_tpu.ops import config as ops_config

    config = LlamaConfig(
        vocab_size=128, hidden_size=1024, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.array([[1, 5, 17, 99, 3, 42, 7, 88]], dtype=np.int64))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    ops_config.set_backend(pallas_qbits=True)
    try:
        qt.freeze(model)
    finally:
        ops_config.set_backend()
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)

    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    assert isinstance(down, WeightQBitsTpuArray)
    assert down.k_shards == 4
    assert down._packed.sharding.spec == P(None, "tp")
    assert down._scale_t.sharding.spec == P("tp", None)
    assert down._shift_t.sharding.spec == P("tp", None)
    # Per-device payload bytes divide by tp (HBM + bandwidth scale-down).
    shard_bytes = {s.data.nbytes for s in down._packed.addressable_shards}
    assert shard_bytes == {down._packed.nbytes // 4}
    o_proj = model.model.layers[0].self_attn.o_proj.weight.get_value()
    assert o_proj._packed.sharding.spec == P(None, "tp")

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        return m(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_tp_row_parallel_generic_qbits_converts_and_shards():
    """A generic (serialized-layout) sub-byte weight hit by a row-parallel
    rule converts to the TPU layout and K-shards rather than replicating."""
    from quanto_tpu.tensor.weights import WeightQBitsTpuArray

    config = LlamaConfig(
        vocab_size=128, hidden_size=1024, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64, dtype=jnp.float32,
    )
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.array([[2, 9, 31, 4]], dtype=np.int64))
    qt.quantize(model, weights="qint4", exclude="lm_head")
    qt.freeze(model)  # off-TPU default: generic layout
    ref, _ = model(ids)

    mesh = make_mesh({"dp": 2, "tp": 4})
    shard_model(model, mesh, LLAMA_TP_RULES)
    down = model.model.layers[0].mlp.down_proj.weight.get_value()
    assert isinstance(down, WeightQBitsTpuArray)
    assert down._packed.sharding.spec == P(None, "tp")

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        return m(ids)[0]

    with mesh:
        out = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)
