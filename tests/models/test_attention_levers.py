"""Cross-family attention levers: every decode family rides the shared
`ops/attention.gqa_attention` chain (or its MLA analogue), so quantized KV
caches (qint8/qint4) and the opt-in bf16 softmax chain must work — with
bounded fidelity loss — for ALL of them, not just the llama-likes.

VERDICT round-3 #3: the levers reached only 7 families; this parametrizes
the fidelity contract over the rest (gpt2/opt/bloom/gpt_neox via the
MHA-as-GQA(G=1) migration, mixtral/qwen2_moe via the shared LlamaAttention,
deepseek_v3 via the MLA latent-cache bf16 chain).

Reference analogue: the per-model generation fidelity checks in
`/root/reference/tests/models/test_quantized_model_for_causal_lm.py`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

from quanto_tpu.ops import config as ops_config


def _llama_like(cls_name, **extra):
    def build():
        import importlib

        mod_name, cls = cls_name
        mod = importlib.import_module(f"quanto_tpu.models.{mod_name}")
        cfg_cls = getattr(mod, cls + "Config")
        model_cls = getattr(mod, cls + "ForCausalLM")
        cfg = cfg_cls(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, dtype=jnp.bfloat16, **extra,
        )
        return model_cls(cfg, rngs=nnx.Rngs(0))

    return build


def _gpt2():
    from quanto_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=128, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        dtype=jnp.bfloat16,
    )
    return GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))


def _opt():
    from quanto_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=48, dtype=jnp.bfloat16,
    )
    return OPTForCausalLM(cfg, rngs=nnx.Rngs(0))


def _bloom():
    from quanto_tpu.models.bloom import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, dtype=jnp.bfloat16,
    )
    return BloomForCausalLM(cfg, rngs=nnx.Rngs(0))


def _gpt_neox():
    from quanto_tpu.models.gpt_neox import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, dtype=jnp.bfloat16,
    )
    return GPTNeoXForCausalLM(cfg, rngs=nnx.Rngs(0))


def _deepseek():
    from quanto_tpu.models.deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, q_lora_rank=24, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=12, v_head_dim=12,
        n_routed_experts=8, n_group=4, topk_group=2, num_experts_per_tok=2,
        n_shared_experts=1, first_k_dense_replace=1, dtype=jnp.bfloat16,
    )
    return DeepseekV3ForCausalLM(cfg, rngs=nnx.Rngs(0))


def _gpt_oss():
    from quanto_tpu.models.gpt_oss import GptOssConfig, GptOssForCausalLM

    cfg = GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=64, dtype=jnp.bfloat16,
    )
    return GptOssForCausalLM(cfg, rngs=nnx.Rngs(0))


FAMILIES = {
    "gpt_oss": _gpt_oss,
    "mixtral": _llama_like(("mixtral", "Mixtral"), num_local_experts=4,
                           num_experts_per_tok=2),
    "qwen2_moe": _llama_like(("qwen2_moe", "Qwen2Moe")),
    "gpt2": _gpt2,
    "opt": _opt,
    "bloom": _bloom,
    "gpt_neox": _gpt_neox,
    "deepseek_v3": _deepseek,
}


def _decode_logits(model, ids, kv_quant):
    cache = model.init_kv_cache(ids.shape[0], 16, kv_quant=kv_quant)
    logits, cache = model(ids[:, :6], cache, 0)
    outs = [logits[:, -1]]
    for t in range(6, ids.shape[1]):
        step, cache = model(ids[:, t : t + 1], cache, t)
        outs.append(step[:, 0])
    return jnp.stack(outs, 1).astype(jnp.float32)


def _kl(ref, got):
    p = jax.nn.softmax(ref, -1)
    q = jax.nn.softmax(got, -1)
    return float(jnp.mean(jnp.sum(p * (jnp.log(p + 1e-9) - jnp.log(q + 1e-9)), -1)))


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_kv_quant_and_bf16_softmax(family):
    model = FAMILIES[family]()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 10)), jnp.int32)
    try:
        ops_config.set_backend(bf16_softmax=False)
        ref = _decode_logits(model, ids, kv_quant=None)
        int8 = _decode_logits(model, ids, kv_quant="qint8")
        int4 = _decode_logits(model, ids, kv_quant="qint4")
        ops_config.set_backend(bf16_softmax=True)
        int4sm = _decode_logits(model, ids, kv_quant="qint4")
    finally:
        ops_config.set_backend()

    # int8 KV: near-lossless next-token distributions. MLA quantizes the
    # compressed LATENT (error then propagates through the kv_b
    # up-projection into every head), so its bound is inherently looser
    # than plain per-head KV quantization.
    int8_bound = 5e-2 if family == "deepseek_v3" else 5e-3
    assert _kl(ref, int8) < int8_bound, (family, _kl(ref, int8))
    # int4 KV (+ bf16 softmax): bounded loss, greedy tokens mostly agree
    # (random tiny models have near-uniform logits, so argmax flips are
    # cheap — KL is the primary gate, agreement a sanity floor).
    assert _kl(ref, int4) < 0.15, (family, _kl(ref, int4))
    assert _kl(ref, int4sm) < 0.2, (family, _kl(ref, int4sm))
    agree = float(jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(int4sm, -1)))
    assert agree >= 0.6, (family, agree)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_float_cache_unchanged_by_flag(family):
    """The bf16_softmax flag must not alter the FLOAT-cache reference path
    for f32 models (bit-identical) — the chain is gated on bf16 dtype."""
    model = FAMILIES[family]()
    # rebuild the same family config at f32
    import dataclasses

    cfg = dataclasses.replace(model.config, dtype=jnp.float32)
    model = type(model)(cfg, rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (1, 5)), jnp.int32)
    try:
        ops_config.set_backend(bf16_softmax=False)
        ref = _decode_logits(model, ids, kv_quant=None)
        ops_config.set_backend(bf16_softmax=True)
        got = _decode_logits(model, ids, kv_quant=None)
    finally:
        ops_config.set_backend()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
