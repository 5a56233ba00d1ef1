"""Scan-over-layers execution for llama-family models.

XLA compiles everything under `jit` once per program; a 16-layer prefill
unrolls 16 structurally identical layer bodies into one giant graph (400+ s
compiles for T=512 on the remote v5e compiler). This module re-executes an
existing `LlamaForCausalLM` (float or quantized/frozen) with its decoder
layers STACKED: per-layer states become one pytree with a leading [L] axis
and a single `lax.scan` runs the layer body — the compiled graph contains
ONE layer, shrinking compile time ~L× with identical numerics.

This is an execution transform, not a different model: quantization,
calibration, serialization and HF checkpoint interop all keep operating on
the per-layer module tree; `stack_model()` is applied at serve time (after
`freeze()`), the TPU analogue of the reference's separation between the
serialized layout and the in-memory optimized layout
(`optimum/quanto/tensor/weights/qbytes.py:191-223`).

Requirements: all decoder layers must share one tree structure (true for
every llama-family config — quantize with per-layer include/exclude patterns
that treat layers uniformly).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax

from .llama import LlamaForCausalLM, _rope


__all__ = ["StackedLlama", "stack_model"]


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


class StackedLlama:
    """Callable wrapper executing a LlamaForCausalLM via lax.scan over layers.

    Usage:
        runner = stack_model(model)
        logits, cache = runner(ids, cache, pos)            # convenience
        fn(state_tuple, ids, cache, pos)                   # jit/pjit form:
        graph static in `runner`, arrays in `runner.state`.
    """

    def __init__(self, model: LlamaForCausalLM):
        self.config = model.config
        layers = list(model.model.layers)
        self.layer_graphdef, state0 = nnx.split(layers[0])
        states = [state0] + [nnx.split(l)[1] for l in layers[1:]]
        treedefs = {str(jax.tree_util.tree_structure(s)) for s in states}
        if len(treedefs) != 1:
            raise ValueError(
                "stack_model requires structurally identical decoder layers "
                "(quantize all layers with the same config)"
            )
        self.embed_graphdef, embed_state = nnx.split(model.model.embed_tokens)
        self.norm_graphdef, norm_state = nnx.split(model.model.norm)
        if model.lm_head is not None:
            self.head_graphdef, head_state = nnx.split(model.lm_head)
        else:
            self.head_graphdef, head_state = None, None
        self.state = (
            _stack_states(states),
            embed_state,
            norm_state,
            head_state,
        )

    def __call__(self, input_ids, cache=None, cache_pos=0):
        return self.apply(self.state, input_ids, cache, cache_pos)

    def apply(self, state, input_ids: jnp.ndarray, cache=None, cache_pos=0):
        """Pure function of (state, inputs) — pass to jit/pjit directly.

        `cache` is a STACKED cache: the per-layer pytree with a leading [L]
        axis on every leaf (see `stack_cache`). Returns (logits, new_cache).
        """
        from ..tensor.qarray import QArray

        stacked_layers, embed_state, norm_state, head_state = state
        c = self.config
        B, T = input_ids.shape
        embed = nnx.merge(self.embed_graphdef, embed_state)
        x = embed(input_ids)
        if c.scale_embeddings:
            x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)
        pos0 = jnp.asarray(cache_pos).reshape(-1, 1)
        positions = jnp.broadcast_to(pos0 + jnp.arange(T)[None, :], (B, T))
        cos, sin = _rope(
            positions, c.head_dim, c.rope_theta, x.dtype,
            c.rope_scaling, c.max_position_embeddings,
        )

        if cache is None:
            mask = jnp.where(
                jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
            )[None, None, :, :]
        else:
            max_len = jax.tree_util.tree_leaves(cache)[0].shape[2]
            q_pos = positions[:, None, :, None]
            k_pos = jnp.arange(max_len)[None, None, None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0, jnp.finfo(jnp.float32).min)

        graphdef = self.layer_graphdef

        def body(x, per_layer):
            layer_state, layer_cache = per_layer
            layer = nnx.merge(graphdef, layer_state)
            x, new_cache = layer(x, cos, sin, mask, layer_cache, cache_pos)
            return x, new_cache

        if cache is None:
            x, _ = lax.scan(body, x, (stacked_layers, None))
            new_cache = None
        else:
            x, new_cache = lax.scan(body, x, (stacked_layers, cache))

        norm = nnx.merge(self.norm_graphdef, norm_state)
        x = norm(x)
        if self.head_graphdef is None:
            emb = nnx.merge(self.embed_graphdef, embed_state).embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            logits = x @ emb.T.astype(x.dtype)
        else:
            head = nnx.merge(self.head_graphdef, head_state)
            logits = head(x)
            if isinstance(logits, QArray):
                logits = logits.dequantize()
        return logits, new_cache

    def init_kv_cache(self, batch: int, max_len: int, dtype=None, kv_quant=None):
        """Stacked cache: leading [L] axis on every leaf (a scan xs/ys)."""
        from .llama import init_kv_cache

        per_layer = init_kv_cache(self.config, batch, max_len, dtype, kv_quant)
        return stack_cache(per_layer)


def stack_cache(per_layer_cache):
    """Tuple-of-layer-caches -> one pytree with leading [L] axes."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer_cache)


def stack_model(model: LlamaForCausalLM) -> StackedLlama:
    return StackedLlama(model)
