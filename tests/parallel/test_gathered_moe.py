"""Single-device capacity-gather MoE dispatch (the prefill FLOP fix).

Oracle: the dense-mask block. With capacity_factor=None the gathered
formulation is exact; with a finite factor overflow tokens drop gracefully.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import quanto_tpu as qt
from quanto_tpu.models.mixtral import MixtralConfig, MixtralForCausalLM, MixtralSparseMoeBlock
from quanto_tpu.parallel import GatheredSparseMoeBlock, convert_moe_to_gathered


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


def test_gathered_block_exact_match_float():
    _, block, x = _block_and_input()
    ref = block(x)
    g = GatheredSparseMoeBlock(block, capacity_factor=None)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(ref), atol=2e-5)


def test_gathered_block_exact_match_quantized_int8():
    _, block, x = _block_and_input()
    qt.quantize(block, weights="qint8")
    qt.freeze(block)
    ref = block(x)
    g = GatheredSparseMoeBlock(block, capacity_factor=None)
    # The gathered block keeps the ORIGINAL frozen expert modules (no
    # stacked copies — stacking forced an HBM->HBM weight copy per call).
    from quanto_tpu.tensor.qarray import QArray

    assert g.experts is block.experts
    assert isinstance(g.experts[0].w1.weight.get_value(), QArray)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(ref), atol=2e-5)


def test_gathered_block_under_jit_capacity_drop():
    _, block, x = _block_and_input()
    g = GatheredSparseMoeBlock(block, capacity_factor=1.0)
    graphdef, state = nnx.split(g)

    @jax.jit
    def f(state, x):
        return nnx.merge(graphdef, state)(x)

    out = f(state, x)
    assert np.isfinite(np.asarray(out)).all()
    # cf=1.0 capacity covers most of uniformly-routed tokens: stay close.
    ref = block(x)
    cos = float(
        np.sum(np.asarray(out) * np.asarray(ref))
        / (np.linalg.norm(np.asarray(out)) * np.linalg.norm(np.asarray(ref)) + 1e-30)
    )
    assert cos > 0.9, cos


def test_convert_model_to_gathered():
    config = _mixtral_config()
    model = MixtralForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 8)), jnp.int32)
    ref, _ = model(ids)
    n = convert_moe_to_gathered(model, capacity_factor=None)
    assert n == config.num_hidden_layers
    out, _ = model(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # cached prefill + decode through the converted model (the serve path)
    from quanto_tpu.models.llama import init_kv_cache
    from quanto_tpu.models.serve import make_decode_fn, make_prefill_fn

    graphdef, state = nnx.split(model)
    cache = init_kv_cache(config, 1, 16, kv_quant="qint8")
    logits, cache = make_prefill_fn(graphdef)(state, ids, cache, 0)
    toks, _ = make_decode_fn(graphdef, 4)(state, ids[:, -1:], cache, 8)
    assert toks.shape == (1, 4)
