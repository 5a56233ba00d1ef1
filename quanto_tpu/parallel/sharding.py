"""Sharding of quantized models over a TPU device mesh.

The torch reference is strictly single-device (SURVEY.md §2.10) — this layer
is new capability, built the TPU way: a `jax.sharding.Mesh` with named axes
(`"dp"` for batch/data parallel, `"tp"` for tensor parallel), `NamedSharding`
annotations on parameters, and XLA inserting the collectives (all-gather for
column-parallel outputs, psum for row-parallel) from the sharding propagation.

QArray sharding rule: `_data` and `_scale` must shard *congruently* — an
`[out, in]` int8 payload sharded ("tp", None) carries its per-out-channel
`[out, 1]` scale sharded ("tp", None) as well; a row-parallel (None, "tp")
payload keeps its scale replicated. `shard_model` applies path-pattern rules
to every parameter, handling QArray pytrees transparently (their children are
ordinary leaves).

Megatron-style rules for the llama family are provided in `LLAMA_TP_RULES`:
column-parallel q/k/v/gate/up projections, row-parallel o/down projections,
vocab-parallel embedding and lm_head.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tensor.qarray import QArray
from ..tensor.weights import WeightQBitsArray, WeightQBitsTpuArray, WeightQBytesArray


__all__ = [
    "make_mesh",
    "shard_model",
    "shard_kv_cache",
    "LLAMA_TP_RULES",
    "GPT2_TP_RULES",
    "MIXTRAL_TP_RULES",
    "OPT_TP_RULES",
    "WHISPER_TP_RULES",
    "T5_TP_RULES",
    "PHI3_TP_RULES",
    "STARCODER2_TP_RULES",
    "NEOX_TP_RULES",
    "FALCON_TP_RULES",
    "DEEPSEEK_V3_TP_RULES",
    "ShardingRule",
]


def make_mesh(shape: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Create a Mesh from {axis_name: size}; sizes must multiply to #devices."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(f"Mesh shape {shape} needs {n} devices, got {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


# A rule: (path regex, spec for the weight payload). The payload spec applies
# to the [out, in] torch-convention weight; float flax kernels [in, out] get
# the transposed spec automatically.
ShardingRule = Tuple[str, P]


# Megatron-style TP layout for the llama family (also fits GPT-2 names when
# adapted). Patterns are matched with re.search against dotted module paths.
LLAMA_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(q_proj|k_proj|v_proj|gate_proj|up_proj)\b", P("tp", None)),  # column-parallel
    (r"\b(o_proj|down_proj)\b", P(None, "tp")),  # row-parallel
    (r"\bembed_tokens\b", P("tp", None)),  # vocab-parallel embedding [vocab, hidden]
    (r"\blm_head\b", P("tp", None)),  # vocab-parallel head [vocab, hidden]
)

GPT2_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(c_attn|c_fc)\b", P("tp", None)),  # column-parallel
    (r"\bc_proj\b", P(None, "tp")),  # row-parallel
    (r"\b(wte|wpe)\b", P("tp", None)),
)

# OPT / Whisper share the transformer naming (q/k/v/out_proj, fc1/fc2):
# column-parallel projections and fc1, row-parallel out_proj/fc2,
# vocab-parallel embedding. Whisper's conv frontend, positional tables and
# norms match no rule and replicate.
OPT_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(q_proj|k_proj|v_proj|fc1)\b", P("tp", None)),
    (r"\b(out_proj|fc2)\b", P(None, "tp")),
    (r"\bembed_tokens\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)

WHISPER_TP_RULES = OPT_TP_RULES

# T5: q/k/v column-parallel, o row-parallel (both self- and cross-attention);
# wi/wi_0/wi_1 column-, wo row-parallel; the shared embedding and untied
# lm_head vocab-parallel. relative_attention_bias ([buckets, heads]) matches
# no rule and replicates — its per-head bias values are gathered with the
# attention logits, which XLA keeps local to each head shard.
T5_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(SelfAttention|EncDecAttention)\.(q|k|v)\b", P("tp", None)),
    (r"\b(SelfAttention|EncDecAttention)\.o\b", P(None, "tp")),
    (r"\b(wi|wi_0|wi_1)\b", P("tp", None)),
    (r"\bwo\b", P(None, "tp")),
    (r"\bshared\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)

# Mixtral: attention as llama; every expert's SwiGLU shards like the dense
# MLP (w1/w3 column-, w2 row-parallel) and the tiny router gate replicates.
# With the dense-mask MoE all experts run on all devices; an "ep" axis
# (experts scattered across devices via shard_map dispatch) is the round-2
# scale-out path.
MIXTRAL_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(q_proj|k_proj|v_proj)\b", P("tp", None)),
    (r"\bo_proj\b", P(None, "tp")),
    (r"\bexperts\.\d+\.(w1|w3)\b", P("tp", None)),
    (r"\bexperts\.\d+\.w2\b", P(None, "tp")),
    (r"\bembed_tokens\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)


# Gemma-2 and Qwen3 (dense + MoE: experts use gate/up/down names) reuse
# LLAMA_TP_RULES unchanged — same projection names, and the per-head-dim
# q/k norms (qwen3) / extra layer norms (gemma2) match no rule and replicate.

# Phi-3 fuses qkv and gate_up into single projections: column-parallel on
# the fused out-dim is still one exact matmul (XLA reshards for the
# downstream split/reshape); o/down row-parallel as usual.
PHI3_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(qkv_proj|gate_up_proj)\b", P("tp", None)),
    (r"\b(o_proj|down_proj)\b", P(None, "tp")),
    (r"\bembed_tokens\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)

# StarCoder2: llama attention names + ungated c_fc/c_proj MLP.
STARCODER2_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(q_proj|k_proj|v_proj|c_fc)\b", P("tp", None)),
    (r"\bc_proj\b", P(None, "tp")),
    (r"\bo_proj\b", P(None, "tp")),
    (r"\bembed_tokens\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)

# GPT-NeoX: fused per-head-interleaved query_key_value shards along the
# out-dim in whole heads as long as tp divides num_heads ([H, 3, D] blocks
# of 3*D stay contiguous per head); dense/dense_4h_to_h row-parallel.
NEOX_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(query_key_value|dense_h_to_4h)\b", P("tp", None)),
    (r"\b(attention\.dense|dense_4h_to_h)\b", P(None, "tp")),
    (r"\bembed_in\b", P("tp", None)),
    (r"\bembed_out\b", P("tp", None)),
)

# DeepSeek-V3 MLA: the per-head up-projections (q_proj / q_b_proj and
# kv_b_proj, out-dim = H * head_dims) shard column-wise in whole heads when
# tp | num_heads; o_proj row-parallel. The low-rank down-projections
# (q_a_proj, kv_a_proj_with_mqa) and their RMSNorms replicate — splitting the
# latent across devices would break the shared-rope-key split and the
# weight-absorbed decode reshape. Routed/shared experts follow the llama
# gate/up/down rules; the router (`gate.weight`) replicates.
DEEPSEEK_V3_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(q_proj|q_b_proj|kv_b_proj|gate_proj|up_proj)\b", P("tp", None)),
    (r"\b(o_proj|down_proj)\b", P(None, "tp")),
    (r"\bembed_tokens\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)

# Falcon / BLOOM share the query_key_value + dense + dense_h_to_4h naming.
FALCON_TP_RULES: Tuple[ShardingRule, ...] = (
    (r"\b(query_key_value|dense_h_to_4h)\b", P("tp", None)),
    (r"\b(self_attention\.dense|dense_4h_to_h)\b", P(None, "tp")),
    (r"\bword_embeddings\b", P("tp", None)),
    (r"\blm_head\b", P("tp", None)),
)


def _match_spec(name: str, rules: Iterable[ShardingRule]) -> Optional[P]:
    for pattern, spec in rules:
        if re.search(pattern, name):
            return spec
    return None


def _scale_spec(weight_spec: P) -> P:
    """Per-out-channel scales [out, 1] follow the weight's out-axis shard."""
    out_axis = weight_spec[0] if len(weight_spec) > 0 else None
    return P(out_axis, None)


def _bias_spec(weight_spec: P) -> P:
    out_axis = weight_spec[0] if len(weight_spec) > 0 else None
    return P(out_axis)


def _put(arr, mesh: Mesh, spec: P):
    if arr is None:
        return None
    # Pad-free sharding only: fall back to replication when the axis size
    # does not divide the dimension.
    for dim, axis in zip(arr.shape, tuple(spec) + (None,) * (arr.ndim - len(spec))):
        if axis is not None and dim % mesh.shape[axis] != 0:
            spec = P()
            break
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _shard_qweight(qw: QArray, mesh: Mesh, spec: P):
    if isinstance(qw, WeightQBytesArray):
        sspec = _scale_spec(spec) if qw.axis is not None else P()
        return WeightQBytesArray(
            _data=_put(qw._data, mesh, spec),
            _scale=_put(qw._scale, mesh, sspec),
            qtype=qw.qtype,
            axis=qw.axis,
            float_dtype=qw.float_dtype,
            activation_qtype=qw.activation_qtype,
        )
    if isinstance(qw, WeightQBitsTpuArray):
        # TPU word-packed layout: `_packed` is [N, K*bits/word] and the
        # transposed group scales/shifts are [G, N].
        # - Column-parallel (out-axis): shard payload rows / scale columns.
        # - Row-parallel (in-axis): repack block-local with k_shards = axis
        #   size, so packed COLUMNS shard at K-block boundaries and each
        #   device owns the whole scale-group rows of its own K blocks;
        #   XLA turns the contraction-sharded matmul into per-device partial
        #   products + psum over the axis (Megatron row-parallel).
        out_axis = spec[0] if len(spec) > 0 else None
        in_axis = spec[1] if len(spec) > 1 else None
        if qw.pad is not None:
            # Off-envelope padded layout: replicate (the padded N slice after
            # the matmul would fight the shard boundary; these dims are the
            # exception, not the TP-critical bulk).
            out_axis = in_axis = None
        if in_axis is not None:
            repacked = qw.repack(mesh.shape[in_axis])
            if repacked is None:
                # Outside the block-local envelope: replicate (pad-free rule).
                in_axis = None
            else:
                qw = repacked
        return WeightQBitsTpuArray(
            _packed=_put(qw._packed, mesh, P(out_axis, in_axis)),
            _scale_t=_put(qw._scale_t, mesh, P(in_axis, out_axis)),
            _shift_t=_put(qw._shift_t, mesh, P(in_axis, out_axis)),
            qtype=qw.qtype,
            group_size=qw.group_size,
            orig_shape=qw.orig_shape,
            float_dtype=qw.float_dtype,
            k_shards=qw.k_shards,
            pad=qw.pad,
        )
    if isinstance(qw, WeightQBitsArray):
        # Generic grouped layout: the packed payload's rows interleave output
        # channels (pack along axis 0 of the grouped view), so sharding it
        # directly would split nibble pairs across devices. Convert to the
        # TPU layout (the shardable one) when eligible, else replicate.
        converted = WeightQBitsTpuArray.from_generic(qw)
        if converted is not None:
            return _shard_qweight(converted, mesh, spec)
        return qw
    return qw


def shard_model(model, mesh: Mesh, rules: Iterable[ShardingRule] = LLAMA_TP_RULES) -> None:
    """Apply TP sharding rules in place to every parameter of an NNX model.

    Parameters not matched by any rule are replicated across the mesh (so
    every array gets a committed placement and jit never guesses).
    """
    from ..nn.qmodule import QModuleMixin

    qmodule_paths = set()
    for path, node in nnx.iter_graph(model):
        if isinstance(node, QModuleMixin):
            qmodule_paths.add(path)
    for path, node in nnx.iter_graph(model):
        if not isinstance(node, nnx.Variable):
            continue
        name = ".".join(str(p) for p in path)
        value = node.get_value()
        if value is None:
            continue
        spec = _match_spec(name, rules)
        attr = path[-1]
        in_qmodule = path[:-1] in qmodule_paths
        if spec is None:
            # Replicate anything without a rule (norms, scalar scales, ...).
            node.set_value(
                jax.tree_util.tree_map(
                    lambda a: _put(a, mesh, P()),
                    value,
                    is_leaf=lambda x: isinstance(x, jnp.ndarray),
                )
            )
            continue
        if isinstance(value, QArray):
            node.set_value(_shard_qweight(value, mesh, spec))
        elif attr == "weight" and in_qmodule:
            # Unfrozen float weight in torch convention [out, in].
            node.set_value(_put(value, mesh, spec))
        elif attr == "kernel":
            # flax convention [in, out]: transpose the spec.
            kspec = P(*reversed(tuple(spec))) if len(spec) == 2 else spec
            node.set_value(_put(value, mesh, kspec))
        elif attr == "embedding":
            node.set_value(_put(value, mesh, spec))
        elif attr == "bias":
            node.set_value(_put(value, mesh, _bias_spec(spec)))
        else:
            node.set_value(_put(value, mesh, P()))


def shard_kv_cache(cache, mesh: Mesh, batch_axis: str = "dp", head_axis: str = "tp"):
    """Shard a KV cache pytree [B, S, H, D] as (dp, None, tp, None)."""
    spec = P(batch_axis, None, head_axis, None)
    return jax.tree_util.tree_map(lambda a: _put(a, mesh, spec), cache)
