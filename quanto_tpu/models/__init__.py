from .llama import KVCache, LlamaConfig, LlamaForCausalLM, init_kv_cache
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .gpt_oss import GptOssConfig, GptOssForCausalLM
from .mixtral import MixtralConfig, MixtralForCausalLM
from .opt import OPTConfig, OPTForCausalLM
from .t5 import T5Config, T5ForConditionalGeneration
from .whisper import WhisperConfig, WhisperForConditionalGeneration
from .vit import ViTConfig, ViTForImageClassification
from .bert import BertConfig, BertForSequenceClassification
from .bloom import BloomConfig, BloomForCausalLM
from .gemma2 import Gemma2Config, Gemma2ForCausalLM
from .gemma3 import Gemma3TextConfig, Gemma3ForCausalLM
from .phi3 import Phi3Config, Phi3ForCausalLM
from .gpt_neox import GPTNeoXConfig, GPTNeoXForCausalLM
from .starcoder2 import Starcoder2Config, Starcoder2ForCausalLM
from .falcon import FalconConfig, FalconForCausalLM
from .qwen3 import Qwen3Config, Qwen3ForCausalLM, Qwen3MoeConfig, Qwen3MoeForCausalLM
from .deepseek_v3 import DeepseekV3Config, DeepseekV3ForCausalLM
from .owlv2 import Owlv2Config, Owlv2ForObjectDetection
from .clip import CLIPConfig, CLIPModel
from .qwen2_moe import Qwen2MoeConfig, Qwen2MoeForCausalLM
from .pixart import PixArtConfig, PixArtTransformer2DModel
from .flux import FluxConfig, FluxTransformer2DModel
from .sd3 import SD3Config, SD3Transformer2DModel
from .unet2d import UNet2DConfig, UNet2DConditionModel
from .diffusers_models import (
    QuantizedDiffusersModel,
    QuantizedFluxTransformer2DModel,
    QuantizedPixArtTransformer2DModel,
    QuantizedSD3Transformer2DModel,
    QuantizedUNet2DConditionModel,
)
from .loading import hf_state_dict, load_hf_state_dict
from .speculative import (
    SpeculativeGenerator,
    make_speculative_decode_fn,
    make_speculative_sample_decode_fn,
    speculative_generate,
)
from .transformers_models import (
    QuantizedModelForCausalLM,
    QuantizedModelForSeq2SeqLM,
    QuantizedTransformersModel,
    build_model,
    from_pretrained_float,
)
