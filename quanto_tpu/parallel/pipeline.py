"""Pipeline parallelism over a ``"pp"`` mesh axis (GPipe microbatching).

The reference has no parallelism at all (SURVEY.md §2.10); this is the
TPU-native pipeline axis completing the dp/tp/ep set: decoder layers are
partitioned into `pp` contiguous STAGES, each device holds one stage's
(quantized) layer weights, and microbatches stream through the stages with
`lax.ppermute` hops between neighbors — the standard JAX SPMD pipelining
recipe (scaling-book "pipelining" chapter): one `lax.scan` over
`MB + pp - 1` ticks, every device running the same program, bubble ticks
computing masked garbage.

Built on `models/scan.StackedLlama`: its stacked [L, ...] layer pytree
reshapes to [pp, L/pp, ...] with the leading axis sharded `P("pp")` — so
ALL weight layouts that stack (float, frozen int8 `WeightQBytesArray`,
sub-byte `WeightQBitsTpuArray` incl. the Pallas kernel path) pipeline
unchanged. Embedding / final norm / head stay replicated (tiny next to the
layer stack) and run outside the shard_map.

Scope: full forward (training loss / prefill logits) — the regime pipeline
parallelism exists for. Decode serving across hosts composes better with
tp/dp (this framework's `shard_model` TP rules) than with pp bubbles.

Composes with data parallelism: pass `dp_axis` and shard the batch; the
stage loop needs no cross-dp communication, so dp rides the same shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scan import StackedLlama, stack_model


__all__ = ["PipelinedLlama", "pipeline_model"]


class PipelinedLlama:
    """Full-forward pipeline executor for a llama-family model.

    Usage:
        pl = pipeline_model(model, mesh, num_microbatches=4)   # pp in mesh
        logits = pl(ids)          # [B, T, vocab], B % (dp * microbatches)==0
        loss_fn = ...; jax.grad through pl.apply works (ppermute/scan are
        differentiable), giving pipeline-parallel training steps.
    """

    def __init__(
        self,
        model,
        mesh: Mesh,
        *,
        pp_axis: str = "pp",
        dp_axis: Optional[str] = None,
        num_microbatches: Optional[int] = None,
    ):
        runner = model if isinstance(model, StackedLlama) else stack_model(model)
        self.config = runner.config
        self.mesh = mesh
        self.pp_axis = pp_axis
        self.dp_axis = dp_axis
        pp = mesh.shape[pp_axis]
        self.pp = pp
        stacked_layers, embed_state, norm_state, head_state = runner.state
        L = jax.tree_util.tree_leaves(stacked_layers)[0].shape[0]
        if L % pp != 0:
            raise ValueError(f"{L} layers do not split over pp={pp} stages")
        self.layers_per_stage = L // pp
        self.num_microbatches = num_microbatches or pp
        self._layer_graphdef = runner.layer_graphdef
        self._embed_graphdef = runner.embed_graphdef
        self._norm_graphdef = runner.norm_graphdef
        self._head_graphdef = runner.head_graphdef

        def put_stage(a):
            a = a.reshape(pp, L // pp, *a.shape[1:])
            return jax.device_put(
                a, NamedSharding(mesh, P(pp_axis, *([None] * (a.ndim - 1))))
            )

        def put_repl(a):
            return jax.device_put(a, NamedSharding(mesh, P()))

        self.stage_state = jax.tree_util.tree_map(put_stage, stacked_layers)
        self.embed_state = jax.tree_util.tree_map(put_repl, embed_state)
        self.norm_state = jax.tree_util.tree_map(put_repl, norm_state)
        self.head_state = (
            jax.tree_util.tree_map(put_repl, head_state)
            if head_state is not None
            else None
        )

    @property
    def state(self):
        return (self.stage_state, self.embed_state, self.norm_state, self.head_state)

    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.apply(self.state, input_ids)

    def apply(self, state, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Pure full-forward: [B, T] -> [B, T, vocab] causal logits.

        B must divide into `num_microbatches` microbatches (each further
        sharded over `dp_axis` when set).
        """
        from ..models.llama import _rope
        from ..tensor.qarray import QArray

        stage_state, embed_state, norm_state, head_state = state
        c = self.config
        MB = self.num_microbatches
        pp = self.pp
        B, T = input_ids.shape
        if B % MB != 0:
            raise ValueError(f"batch {B} does not split into {MB} microbatches")
        b = B // MB
        if self.dp_axis is not None:
            dp = self.mesh.shape[self.dp_axis]
            if b % dp != 0:
                raise ValueError(
                    f"microbatch rows {b} (batch {B} / {MB} microbatches) do "
                    f"not shard over {self.dp_axis}={dp}"
                )

        embed = nnx.merge(self._embed_graphdef, embed_state)
        x = embed(input_ids)
        if c.scale_embeddings:
            x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)
        # Batch-1 rope tables: broadcast over whatever per-shard microbatch
        # rows the dp sharding leaves (the layers broadcast cos/sin on dim 0).
        positions = jnp.arange(T)[None, :]
        cos, sin = _rope(
            positions, c.head_dim, c.rope_theta, x.dtype,
            c.rope_scaling, c.max_position_embeddings,
        )
        mask = jnp.where(
            jnp.tril(jnp.ones((T, T), bool)), 0.0, jnp.finfo(jnp.float32).min
        )[None, None, :, :]
        x_mbs = x.reshape(MB, b, T, -1)

        graphdef = self._layer_graphdef
        pp_axis = self.pp_axis

        def stage_run(local_layers, x, cos, sin, mask):
            # local_layers leaves [1, L/pp, ...] -> scan this stage's layers
            def body(x, per_layer):
                layer = nnx.merge(graphdef, per_layer)
                x, _ = layer(x, cos, sin, mask, None, None)
                return x, None

            sliced = jax.tree_util.tree_map(lambda a: a[0], local_layers)
            x, _ = lax.scan(body, x, sliced)
            return x

        def pipelined(local_layers, x_mbs, cos, sin, mask):
            idx = lax.axis_index(pp_axis)
            perm = [(i, (i + 1) % pp) for i in range(pp)]

            def tick(carry, t):
                buf, outs = carry
                inject = x_mbs[jnp.clip(t, 0, MB - 1)]
                inp = jnp.where(idx == 0, inject, buf)
                out = stage_run(local_layers, inp, cos, sin, mask)
                nxt = lax.ppermute(out, pp_axis, perm)
                o_t = t - (pp - 1)
                slot = jnp.clip(o_t, 0, MB - 1)
                keep = jnp.where(o_t >= 0, out, outs[slot])
                outs = outs.at[slot].set(keep)
                return (nxt, outs), None

            outs0 = jnp.zeros_like(x_mbs)
            buf0 = jnp.zeros_like(x_mbs[0])
            (_, outs), _ = lax.scan(
                tick, (buf0, outs0), jnp.arange(MB + pp - 1)
            )
            # Only the LAST stage's buffer holds the pipeline output; the
            # masked psum broadcasts it to every pp shard (out_specs P()).
            outs = lax.psum(
                jnp.where(idx == pp - 1, outs, jnp.zeros_like(outs)), pp_axis
            )
            return outs

        batch_spec = P(None, self.dp_axis) if self.dp_axis else P()
        layer_specs = jax.tree_util.tree_map(
            lambda a: P(pp_axis, *([None] * (a.ndim - 1))), stage_state
        )
        outs = jax.shard_map(
            pipelined,
            mesh=self.mesh,
            in_specs=(layer_specs, batch_spec, P(), P(), P()),
            out_specs=batch_spec,
            check_vma=False,  # quantized stages may run pallas kernels
        )(stage_state, x_mbs, cos, sin, mask)

        x = outs.reshape(B, T, -1)
        norm = nnx.merge(self._norm_graphdef, norm_state)
        x = norm(x)
        if self._head_graphdef is None:
            emb = nnx.merge(self._embed_graphdef, embed_state).embedding.get_value()
            if isinstance(emb, QArray):
                emb = emb.dequantize()
            logits = x @ emb.T.astype(x.dtype)
        else:
            head = nnx.merge(self._head_graphdef, head_state)
            logits = head(x)
            if isinstance(logits, QArray):
                logits = logits.dequantize()
        return logits


def pipeline_model(
    model,
    mesh: Mesh,
    *,
    pp_axis: str = "pp",
    dp_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
) -> PipelinedLlama:
    """Stage-partition `model` (a LlamaForCausalLM or StackedLlama) over
    `mesh[pp_axis]`. Apply AFTER quantize/freeze (stacking requirement:
    structurally identical decoder layers)."""
    return PipelinedLlama(
        model, mesh, pp_axis=pp_axis, dp_axis=dp_axis,
        num_microbatches=num_microbatches,
    )
