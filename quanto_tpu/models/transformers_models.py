"""Quantized model wrappers and checkpoint I/O.

TPU-native analogue of the reference HF integration
(`optimum/quanto/models/transformers_models.py:43-183`): a wrapper class that
quantizes + freezes a causal LM, saves `model.safetensors` +
`quanto_qmap.json` + `config.json`, and restores a quantized model from such
a directory (including directories produced by the torch reference, since the
tensor names and packing are interoperable).

Unlike the reference (which wraps torch modules from transformers), the
models themselves are our NNX implementations (`quanto_tpu.models.llama`,
`quanto_tpu.models.gpt2`), selected by the `model_type` in `config.json`.
"""

from __future__ import annotations

import json
import os
import jax.numpy as jnp

from ..quantize import freeze as freeze_model
from ..quantize import get_module_by_name, quantization_map, quantize, set_module_by_name
from ..nn.qmodule import quantize_module
from ..utils.safetensors_io import LazySafetensors, load_file, save_file, save_sharded
from .loading import hf_state_dict, load_hf_state_dict


__all__ = [
    "QuantizedTransformersModel",
    "QuantizedModelForCausalLM",
    "QuantizedModelForSeq2SeqLM",
    "build_model",
    "from_pretrained_float",
]

QMAP_NAME = "quanto_qmap.json"  # same file name as the reference (`transformers_models.py:48`)


def _build_from_hf_config(hf_config, dtype=jnp.bfloat16, rngs=None):
    """Instantiate the right NNX architecture for a transformers config."""
    from .gpt2 import GPT2Config, GPT2LMHeadModel
    from .llama import LlamaConfig, LlamaForCausalLM
    from .opt import OPTConfig, OPTForCausalLM

    model_type = getattr(hf_config, "model_type", None) or hf_config.get("model_type")
    if model_type in ("llama", "mistral", "qwen2", "gemma"):
        return LlamaForCausalLM(LlamaConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gemma2":
        from .gemma2 import Gemma2Config, Gemma2ForCausalLM

        return Gemma2ForCausalLM(Gemma2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type in ("gemma3_text", "gemma3"):
        from .gemma3 import Gemma3TextConfig, Gemma3ForCausalLM

        # Multimodal gemma3 configs nest the LM under `text_config`.
        text_config = getattr(hf_config, "text_config", None) or hf_config
        return Gemma3ForCausalLM(Gemma3TextConfig.from_hf(text_config, dtype=dtype), rngs=rngs)
    if model_type == "phi3":
        from .phi3 import Phi3Config, Phi3ForCausalLM

        return Phi3ForCausalLM(Phi3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gpt_neox":
        from .gpt_neox import GPTNeoXConfig, GPTNeoXForCausalLM

        return GPTNeoXForCausalLM(GPTNeoXConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "starcoder2":
        from .starcoder2 import Starcoder2Config, Starcoder2ForCausalLM

        return Starcoder2ForCausalLM(Starcoder2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "falcon":
        from .falcon import FalconConfig, FalconForCausalLM

        return FalconForCausalLM(FalconConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen3":
        from .qwen3 import Qwen3Config, Qwen3ForCausalLM

        return Qwen3ForCausalLM(Qwen3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen3_moe":
        from .qwen3 import Qwen3MoeConfig, Qwen3MoeForCausalLM

        return Qwen3MoeForCausalLM(Qwen3MoeConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "deepseek_v3":
        from .deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM

        return DeepseekV3ForCausalLM(DeepseekV3Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "mixtral":
        from .mixtral import MixtralConfig, MixtralForCausalLM

        return MixtralForCausalLM(MixtralConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "qwen2_moe":
        from .qwen2_moe import Qwen2MoeConfig, Qwen2MoeForCausalLM

        return Qwen2MoeForCausalLM(Qwen2MoeConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "gpt2":
        return GPT2LMHeadModel(GPT2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "opt":
        return OPTForCausalLM(OPTConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type in ("t5", "mt5"):
        from .t5 import T5Config, T5ForConditionalGeneration

        return T5ForConditionalGeneration(T5Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "whisper":
        from .whisper import WhisperConfig, WhisperForConditionalGeneration

        return WhisperForConditionalGeneration(WhisperConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "vit":
        from .vit import ViTConfig, ViTForImageClassification

        return ViTForImageClassification(ViTConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "bert":
        from .bert import BertConfig, BertForSequenceClassification

        return BertForSequenceClassification(BertConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "bloom":
        from .bloom import BloomConfig, BloomForCausalLM

        return BloomForCausalLM(BloomConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "owlv2":
        from .owlv2 import Owlv2Config, Owlv2ForObjectDetection

        return Owlv2ForObjectDetection(Owlv2Config.from_hf(hf_config, dtype=dtype), rngs=rngs)
    if model_type == "clip":
        from .clip import CLIPConfig, CLIPModel

        return CLIPModel(CLIPConfig.from_hf(hf_config, dtype=dtype), rngs=rngs)
    raise ValueError(
        f"Unsupported model_type {model_type!r}: supported are llama, mistral, qwen2, gemma, gemma2, mixtral, qwen2_moe, gpt2, opt, t5, mt5, whisper, vit, bert, bloom, owlv2"
    )


def build_model(hf_config, dtype=jnp.bfloat16, rngs=None):
    return _build_from_hf_config(hf_config, dtype=dtype, rngs=rngs)


def _synthesize_hf_config(model):
    """HF PretrainedConfig equivalent of a quanto_tpu-native model config."""
    from .gpt2 import GPT2LMHeadModel
    from .llama import LlamaForCausalLM

    c = getattr(model, "config", None)
    if c is None:
        return None
    if isinstance(model, LlamaForCausalLM):
        from transformers import LlamaConfig as HFLlamaConfig

        return HFLlamaConfig(
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            head_dim=c.head_dim,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps,
            rope_theta=c.rope_theta,
            rope_scaling=dict(c.rope_scaling) if c.rope_scaling else None,
            tie_word_embeddings=c.tie_word_embeddings,
            attention_bias=c.attention_bias,
            mlp_bias=c.mlp_bias,
            hidden_act=c.hidden_act,
        )
    if isinstance(model, GPT2LMHeadModel):
        from transformers import GPT2Config as HFGPT2Config

        return HFGPT2Config(
            vocab_size=c.vocab_size, n_positions=c.n_positions, n_embd=c.n_embd,
            n_layer=c.n_layer, n_head=c.n_head, layer_norm_epsilon=c.layer_norm_epsilon,
        )
    from .gemma2 import Gemma2ForCausalLM

    if isinstance(model, Gemma2ForCausalLM):
        from transformers import Gemma2Config as HFGemma2Config

        return HFGemma2Config(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            head_dim=c.head_dim,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            query_pre_attn_scalar=c.query_pre_attn_scalar,
            attn_logit_softcapping=c.attn_logit_softcapping,
            final_logit_softcapping=c.final_logit_softcapping,
            sliding_window=c.sliding_window,
            layer_types=list(c.layer_types),
            attention_bias=c.attention_bias,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .phi3 import Phi3ForCausalLM

    if isinstance(model, Phi3ForCausalLM):
        from transformers import Phi3Config as HFPhi3Config

        return HFPhi3Config(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            partial_rotary_factor=c.partial_rotary_factor,
            sliding_window=c.sliding_window,
            tie_word_embeddings=c.tie_word_embeddings,
            rope_scaling=(
                {k: list(v) if isinstance(v, tuple) else v for k, v in c.rope_scaling}
                if c.rope_scaling else None
            ),
            original_max_position_embeddings=c.original_max_position_embeddings,
        )
    from .gpt_neox import GPTNeoXForCausalLM

    if isinstance(model, GPTNeoXForCausalLM):
        from transformers import GPTNeoXConfig as HFGPTNeoXConfig

        return HFGPTNeoXConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            rotary_pct=c.rotary_pct, rotary_emb_base=c.rope_theta,
            max_position_embeddings=c.max_position_embeddings,
            layer_norm_eps=c.layer_norm_eps,
            use_parallel_residual=c.use_parallel_residual,
            attention_bias=c.attention_bias,
            hidden_act=c.hidden_act,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .starcoder2 import Starcoder2ForCausalLM

    if isinstance(model, Starcoder2ForCausalLM):
        from transformers import Starcoder2Config as HFStarcoder2Config

        return HFStarcoder2Config(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            max_position_embeddings=c.max_position_embeddings,
            norm_epsilon=c.norm_epsilon, rope_theta=c.rope_theta,
            sliding_window=c.sliding_window, use_bias=c.use_bias,
            hidden_act=c.hidden_act,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .qwen3 import Qwen3ForCausalLM, Qwen3MoeForCausalLM

    if isinstance(model, Qwen3ForCausalLM):  # covers Qwen3MoeForCausalLM subclass
        common = dict(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            head_dim=c.head_dim,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            rope_scaling=dict(c.rope_scaling) if c.rope_scaling else None,
            tie_word_embeddings=c.tie_word_embeddings,
            hidden_act=c.hidden_act,
        )
        if isinstance(model, Qwen3MoeForCausalLM):
            from transformers import Qwen3MoeConfig as HFQwen3MoeConfig

            return HFQwen3MoeConfig(
                num_experts=c.num_experts,
                num_experts_per_tok=c.num_experts_per_tok,
                moe_intermediate_size=c.moe_intermediate_size,
                norm_topk_prob=c.norm_topk_prob,
                decoder_sparse_step=c.decoder_sparse_step,
                mlp_only_layers=list(c.mlp_only_layers),
                **common,
            )
        from transformers import Qwen3Config as HFQwen3Config

        return HFQwen3Config(**common)
    from .gemma3 import Gemma3ForCausalLM

    if isinstance(model, Gemma3ForCausalLM):
        from transformers import Gemma3TextConfig as HFGemma3TextConfig

        return HFGemma3TextConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            head_dim=c.head_dim,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            rope_local_base_freq=c.rope_local_base_freq,
            rope_scaling=(
                {"rope_type": "linear", "factor": c.rope_scaling_factor}
                if c.rope_scaling_factor else None
            ),
            query_pre_attn_scalar=c.query_pre_attn_scalar,
            sliding_window=c.sliding_window,
            sliding_window_pattern=c.sliding_window_pattern,
            layer_types=list(c.layer_types),
            attention_bias=c.attention_bias,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .deepseek_v3 import DeepseekV3ForCausalLM

    if isinstance(model, DeepseekV3ForCausalLM):
        from transformers import DeepseekV3Config as HFDeepseekV3Config

        return HFDeepseekV3Config(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            moe_intermediate_size=c.moe_intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            n_shared_experts=c.n_shared_experts,
            n_routed_experts=c.n_routed_experts,
            routed_scaling_factor=c.routed_scaling_factor,
            kv_lora_rank=c.kv_lora_rank, q_lora_rank=c.q_lora_rank,
            qk_rope_head_dim=c.qk_rope_head_dim,
            v_head_dim=c.v_head_dim, qk_nope_head_dim=c.qk_nope_head_dim,
            n_group=c.n_group, topk_group=c.topk_group,
            num_experts_per_tok=c.num_experts_per_tok,
            first_k_dense_replace=c.first_k_dense_replace,
            norm_topk_prob=c.norm_topk_prob,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            rope_interleave=c.rope_interleave,
            attention_bias=c.attention_bias,
            tie_word_embeddings=c.tie_word_embeddings,
            hidden_act=c.hidden_act,
        )
    from .falcon import FalconForCausalLM

    if isinstance(model, FalconForCausalLM):
        from transformers import FalconConfig as HFFalconConfig

        return HFFalconConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_kv_heads=c.num_kv_heads,
            layer_norm_epsilon=c.layer_norm_epsilon,
            alibi=c.alibi,
            new_decoder_architecture=c.new_decoder_architecture,
            multi_query=c.multi_query, parallel_attn=c.parallel_attn,
            num_ln_in_parallel_attn=c.num_ln_in_parallel_attn,
            bias=c.bias,
            max_position_embeddings=c.max_position_embeddings,
            rope_theta=c.rope_theta, ffn_hidden_size=c.ffn_hidden_size,
            activation=c.activation,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .mixtral import MixtralForCausalLM

    if isinstance(model, MixtralForCausalLM):
        from transformers import MixtralConfig as HFMixtralConfig

        return HFMixtralConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            num_local_experts=c.num_local_experts,
            num_experts_per_tok=c.num_experts_per_tok,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .qwen2_moe import Qwen2MoeForCausalLM

    if isinstance(model, Qwen2MoeForCausalLM):
        from transformers import Qwen2MoeConfig as HFQwen2MoeConfig

        return HFQwen2MoeConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            moe_intermediate_size=c.moe_intermediate_size,
            shared_expert_intermediate_size=c.shared_expert_intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            num_key_value_heads=c.num_key_value_heads,
            max_position_embeddings=c.max_position_embeddings,
            rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
            num_experts=c.num_experts,
            num_experts_per_tok=c.num_experts_per_tok,
            norm_topk_prob=c.norm_topk_prob,
            decoder_sparse_step=c.decoder_sparse_step,
            mlp_only_layers=list(c.mlp_only_layers),
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .t5 import T5ForConditionalGeneration

    if isinstance(model, T5ForConditionalGeneration):
        from transformers import T5Config as HFT5Config

        return HFT5Config(
            vocab_size=c.vocab_size, d_model=c.d_model, d_kv=c.d_kv, d_ff=c.d_ff,
            num_layers=c.num_layers, num_decoder_layers=c.num_decoder_layers,
            num_heads=c.num_heads,
            relative_attention_num_buckets=c.relative_attention_num_buckets,
            relative_attention_max_distance=c.relative_attention_max_distance,
            layer_norm_epsilon=c.layer_norm_epsilon,
            feed_forward_proj=c.feed_forward_proj,
            tie_word_embeddings=c.tie_word_embeddings,
            decoder_start_token_id=c.decoder_start_token_id,
        )
    from .whisper import WhisperForConditionalGeneration

    if isinstance(model, WhisperForConditionalGeneration):
        from transformers import WhisperConfig as HFWhisperConfig

        return HFWhisperConfig(
            vocab_size=c.vocab_size, num_mel_bins=c.num_mel_bins, d_model=c.d_model,
            encoder_layers=c.encoder_layers, encoder_attention_heads=c.encoder_attention_heads,
            encoder_ffn_dim=c.encoder_ffn_dim, decoder_layers=c.decoder_layers,
            decoder_attention_heads=c.decoder_attention_heads, decoder_ffn_dim=c.decoder_ffn_dim,
            max_source_positions=c.max_source_positions,
            max_target_positions=c.max_target_positions,
            decoder_start_token_id=c.decoder_start_token_id,
        )
    from .owlv2 import Owlv2ForObjectDetection

    if isinstance(model, Owlv2ForObjectDetection):
        from transformers import Owlv2Config as HFOwlv2Config

        tower = lambda t, extra: {
            "hidden_size": t.hidden_size, "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "layer_norm_eps": t.layer_norm_eps, "attention_dropout": 0.0, **extra,
        }
        return HFOwlv2Config(
            text_config=tower(c.text, {
                "vocab_size": c.vocab_size,
                "max_position_embeddings": c.max_position_embeddings,
            }),
            vision_config=tower(c.vision, {
                "image_size": c.image_size, "patch_size": c.patch_size,
                "num_channels": c.num_channels,
            }),
            projection_dim=c.projection_dim,
            logit_scale_init_value=c.logit_scale_init_value,
        )
    from .clip import CLIPModel as NNXCLIPModel

    if isinstance(model, NNXCLIPModel):
        from transformers import CLIPConfig as HFCLIPConfig

        tower = lambda t, extra: {
            "hidden_size": t.hidden_size, "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "layer_norm_eps": t.layer_norm_eps, "hidden_act": t.hidden_act,
            "attention_dropout": 0.0, **extra,
        }
        return HFCLIPConfig(
            text_config=tower(c.text, {
                "vocab_size": c.vocab_size,
                "max_position_embeddings": c.max_position_embeddings,
                "eos_token_id": c.eos_token_id,
            }),
            vision_config=tower(c.vision, {
                "image_size": c.image_size, "patch_size": c.patch_size,
                "num_channels": c.num_channels,
            }),
            projection_dim=c.projection_dim,
            logit_scale_init_value=c.logit_scale_init_value,
        )
    from .bloom import BloomForCausalLM

    if isinstance(model, BloomForCausalLM):
        from transformers import BloomConfig as HFBloomConfig

        return HFBloomConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            n_layer=c.num_hidden_layers, n_head=c.num_attention_heads,
            layer_norm_epsilon=c.layer_norm_epsilon,
            apply_residual_connection_post_layernorm=c.apply_residual_connection_post_layernorm,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    from .bert import BertForSequenceClassification

    if isinstance(model, BertForSequenceClassification):
        from transformers import BertConfig as HFBertConfig

        return HFBertConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size, layer_norm_eps=c.layer_norm_eps,
            id2label={i: f"LABEL_{i}" for i in range(c.num_labels)},
        )
    from .vit import ViTForImageClassification

    if isinstance(model, ViTForImageClassification):
        from transformers import ViTConfig as HFViTConfig

        return HFViTConfig(
            hidden_size=c.hidden_size, num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size, image_size=c.image_size,
            patch_size=c.patch_size, num_channels=c.num_channels,
            layer_norm_eps=c.layer_norm_eps,
            id2label={i: f"LABEL_{i}" for i in range(c.num_labels)},
        )
    from .opt import OPTForCausalLM

    if isinstance(model, OPTForCausalLM):
        from transformers import OPTConfig as HFOPTConfig

        return HFOPTConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size, ffn_dim=c.ffn_dim,
            num_hidden_layers=c.num_hidden_layers, num_attention_heads=c.num_attention_heads,
            max_position_embeddings=c.max_position_embeddings,
            word_embed_proj_dim=c.word_embed_proj_dim,
            do_layer_norm_before=c.do_layer_norm_before, enable_bias=c.enable_bias,
            tie_word_embeddings=c.tie_word_embeddings,
        )
    return None


def _load_config(directory: str):
    from transformers import AutoConfig

    return AutoConfig.from_pretrained(directory)


def _load_tensors(directory: str):
    """Single-file or sharded-index safetensors, lazily for shards
    (reference `transformers_models.py:142-154` + `shared_dict.py`)."""
    index_path = os.path.join(directory, "model.safetensors.index.json")
    single_path = os.path.join(directory, "model.safetensors")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted({os.path.join(directory, v) for v in index["weight_map"].values()})
        return LazySafetensors.from_files(files)
    if os.path.exists(single_path):
        return load_file(single_path)
    raise FileNotFoundError(f"No model.safetensors(.index.json) found in {directory}")


def from_pretrained_float(
    name_or_path: str, dtype=jnp.bfloat16, revision=None, cache_dir=None
):
    """Load a FLOAT Hugging Face checkpoint into our NNX implementation.

    Accepts a local directory or a hub-id-shaped name resolved through
    `models.hub.resolve_model_path` (reference `ModelHubMixin.from_pretrained`,
    `transformers_models.py:114-127`)."""
    from .hub import resolve_model_path

    directory = resolve_model_path(name_or_path, revision=revision, cache_dir=cache_dir)
    hf_config = _load_config(directory)
    model = _build_from_hf_config(hf_config, dtype=dtype)
    tensors = _load_tensors(directory)
    load_hf_state_dict(model, tensors, dtype=dtype)
    model._hf_config = hf_config
    return model


class QuantizedTransformersModel:
    """Wrapper around a quantized NNX model
    (reference `transformers_models.py:43-179`)."""

    def __init__(self, model):
        self._wrapped = model

    def __getattr__(self, name):
        # Forward anything we don't define to the wrapped model
        # (reference `transformers_models.py:56-62`).
        return getattr(self._wrapped, name)

    def __call__(self, *args, **kwargs):
        return self._wrapped(*args, **kwargs)

    @classmethod
    def quantize(
        cls,
        model,
        weights=None,
        activations=None,
        optimizer=None,
        include=None,
        exclude=None,
    ) -> "QuantizedTransformersModel":
        """Quantize and freeze an NNX model
        (reference `transformers_models.py:68-112`)."""
        quantize(
            model,
            weights=weights,
            activations=activations,
            optimizer=optimizer,
            include=include,
            exclude=exclude,
        )
        freeze_model(model)
        return cls(model)

    @classmethod
    def from_pretrained(
        cls, name_or_path: str, dtype=jnp.bfloat16, revision=None, cache_dir=None
    ) -> "QuantizedTransformersModel":
        """Reload a quantized model saved by `save_pretrained` (ours or the
        torch reference's; reference `transformers_models.py:114-163`).
        Accepts a local directory or a hub id (resolved via `models.hub`)."""
        from .hub import resolve_model_path

        directory = resolve_model_path(name_or_path, revision=revision, cache_dir=cache_dir)
        qmap_path = os.path.join(directory, QMAP_NAME)
        if not os.path.exists(qmap_path):
            raise ValueError(
                f"No {QMAP_NAME} found in {directory}: this is not a quantized model directory."
            )
        with open(qmap_path) as f:
            qmap = json.load(f)
        hf_config = _load_config(directory)
        model = _build_from_hf_config(hf_config, dtype=dtype)
        # Swap quantized modules per the map, then restore tensors.
        for name, cfg in qmap.items():
            weights = None if cfg["weights"] == "none" else cfg["weights"]
            activations = None if cfg["activations"] == "none" else cfg["activations"]
            try:
                m = get_module_by_name(model, name)
            except (AttributeError, KeyError, IndexError):
                continue
            qmodule = quantize_module(m, weights=weights, activations=activations, optimizer=None)
            if qmodule is not None:
                set_module_by_name(model, name, qmodule)
        tensors = _load_tensors(directory)
        load_hf_state_dict(model, tensors, dtype=dtype)
        model._hf_config = hf_config
        return cls(model)

    def save_pretrained(
        self,
        directory: str,
        max_shard_size: str | int = "5GB",
        push_to_hub: bool = False,
        repo_id: str | None = None,
    ) -> None:
        """Write config.json, quanto_qmap.json and model.safetensors
        (reference `transformers_models.py:165-179`). Checkpoints larger
        than `max_shard_size` split into model-XXXXX-of-XXXXX.safetensors
        shards with a model.safetensors.index.json (the transformers
        convention; our loader and the reference's ShardedStateDict both
        read it)."""
        os.makedirs(directory, exist_ok=True)
        hf_config = getattr(self._wrapped, "_hf_config", None)
        if hf_config is None:
            # Model built directly from a quanto_tpu config: synthesize the
            # HF-style config.json so from_pretrained can rebuild it.
            hf_config = _synthesize_hf_config(self._wrapped)
        if hf_config is not None:
            hf_config.save_pretrained(directory)
        with open(os.path.join(directory, QMAP_NAME), "w") as f:
            json.dump(quantization_map(self._wrapped), f, indent=2)
        save_sharded(hf_state_dict(self._wrapped), directory, max_shard_size)
        if push_to_hub:
            self._push_to_hub(directory, repo_id)

    def _push_to_hub(self, directory: str, repo_id: str | None) -> None:
        """Upload a saved checkpoint (reference ModelHubMixin.push_to_hub).
        Requires network access and `huggingface_hub`; raises a clean error
        offline instead of hanging."""
        if repo_id is None:
            raise ValueError("push_to_hub=True requires repo_id")
        from .hub import _offline

        if _offline():
            raise RuntimeError(
                "push_to_hub requested but this environment is offline "
                "(QUANTO_TPU_OFFLINE/HF_HUB_OFFLINE set)."
            )
        try:
            from huggingface_hub import HfApi
        except ImportError as e:
            raise RuntimeError("push_to_hub requires huggingface_hub") from e
        HfApi().upload_folder(folder_path=directory, repo_id=repo_id)


class QuantizedModelForCausalLM(QuantizedTransformersModel):
    """Causal-LM flavor (reference `transformers_models.py:182-183`)."""


class QuantizedModelForSeq2SeqLM(QuantizedTransformersModel):
    """Encoder-decoder flavor (T5/MT5). The reference reaches seq2seq models
    through `optimum-cli quanto quantize --task`; here the wrapper is
    explicit since the NNX architectures are our own."""
