from .distributed import global_mesh, initialize
from .elastic import ElasticCheckpointer, Watchdog, barrier_probe, supervise
from .context import (
    active_sp,
    cp_cached_attention,
    cp_decode_attention,
    cp_gqa_attention,
    shard_cache_seq,
    sp_serving,
)
from .pipeline import PipelinedLlama, pipeline_model
from .moe import (
    EPDeepseekMoE,
    EPSparseMoeBlock,
    GatheredSparseMoeBlock,
    StackedDeepseekMoE,
    StackedGptOssMoE,
    convert_gpt_oss_moe_to_stacked,
    StackedSparseMoeBlock,
    convert_moe_to_ep,
    convert_moe_to_gathered,
    convert_moe_to_stacked,
)
from .sharding import (
    DEEPSEEK_V3_TP_RULES,
    FALCON_TP_RULES,
    GPT2_TP_RULES,
    MIXTRAL_TP_RULES,
    LLAMA_TP_RULES,
    NEOX_TP_RULES,
    OPT_TP_RULES,
    PHI3_TP_RULES,
    STARCODER2_TP_RULES,
    T5_TP_RULES,
    WHISPER_TP_RULES,
    ShardingRule,
    make_mesh,
    shard_kv_cache,
    shard_model,
)
