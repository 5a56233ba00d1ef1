"""Expert-parallel MoE execution over an ``"ep"`` mesh axis.

The torch reference has no parallelism of any kind (SURVEY.md §2.10); its
MoE models run every expert on the one device. Our dense-mask MoE blocks
(`models/mixtral.py`, `models/qwen2_moe.py`) are the jit-friendly
single-chip formulation, but they spend E× FLOPs and hold all E experts'
weights on every device. This module is the scale-out story, built the TPU
way:

- expert weights (float, frozen int8 `WeightQBytesArray`, or frozen sub-byte
  `WeightQBitsTpuArray`) are STACKED along a leading expert axis and sharded
  ``P("ep", ...)`` over the mesh — each device holds E/ep experts, so
  per-device weight memory and FLOPs drop by the ep factor;
- routing (the tiny gate matmul + top-k) runs replicated;
- dispatch runs under `jax.shard_map`: each shard gathers, for each of its
  local experts, the top-`capacity` tokens by routing weight (a static-shape
  `lax.top_k` + `take` — no dynamic shapes, XLA-friendly), applies the expert
  MLP through the normal quantized-op stack (`ops.qlinear`, so the Pallas
  sub-byte kernels are used on TPU), scatter-adds the weighted results, and a
  `psum` over "ep" combines shards.

Tokens routed to an expert beyond its capacity are dropped (the standard
capacity-factor semantics); with ``capacity_factor=None`` capacity equals the
token count and the result matches the dense-mask block exactly.

This is a deployment transform: `convert_moe_to_ep(model, mesh)` swaps the
dense blocks in place after loading/quantizing/freezing. Serialization stays
in the dense per-expert layout (the same "canonical layout on disk, optimized
layout in memory" rule the reference uses for its kernel-specific tensors,
`optimum/quanto/tensor/weights/qbytes.py:211-223`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tensor.qarray import QArray
from ..tensor.weights import WeightQBitsTpuArray, WeightQBytesArray


__all__ = [
    "EPDeepseekMoE",
    "EPSparseMoeBlock",
    "GatheredSparseMoeBlock",
    "StackedSparseMoeBlock",
    "StackedDeepseekMoE",
    "StackedGptOssMoE",
    "convert_gpt_oss_moe_to_stacked",
    "convert_moe_to_ep",
    "convert_moe_to_gathered",
    "convert_moe_to_stacked",
]


def _maybe_deq(x):
    return x.dequantize() if isinstance(x, QArray) else x


def _expert_weight(proj) -> object:
    """Extract a projection's weight in torch [out, in] convention.

    Accepts `QLinear` (frozen QArray or float weight) and `nnx.Linear`
    (flax [in, out] kernel, transposed here). Expert MLPs have no bias in
    the supported families; reject biased projections loudly.
    """
    from ..nn.qmodule import QModuleMixin

    if isinstance(proj, QModuleMixin):
        if proj.bias is not None:
            raise ValueError("EP dispatch supports bias-free expert projections only")
        w = proj.weight.get_value()
        if not isinstance(w, QArray):
            # Unfrozen QLinear: dynamic per-call quantization does not
            # commute with stacking; use the float weights (freeze first to
            # keep the quantized kernels).
            return jnp.asarray(w)
        return w
    if isinstance(proj, nnx.Linear):
        if proj.bias is not None:
            raise ValueError("EP dispatch supports bias-free expert projections only")
        return jnp.transpose(proj.kernel.get_value())
    raise TypeError(f"unsupported expert projection module: {type(proj).__name__}")


class _StackedProj(nnx.Module):
    """One projection (gate/up/down) stacked over all experts.

    Holds the stacked leaves as `nnx.Param`s (so they travel through
    `nnx.split`/jit like any other weight) plus static metadata needed to
    reconstruct a per-expert weight view inside the dispatch shard.
    """

    def __init__(self, weights: Sequence[object], mesh: Optional[Mesh], ep_axis: Optional[str]):
        def put(stacked):
            if mesh is None:  # single-device gathered dispatch: no sharding
                return stacked
            spec = P(ep_axis, *([None] * (stacked.ndim - 1)))
            return jax.device_put(stacked, NamedSharding(mesh, spec))

        w0 = weights[0]
        if isinstance(w0, WeightQBytesArray):
            self.kind = "qbytes"
            if any(w.axis != w0.axis or w.qtype is not w0.qtype for w in weights):
                raise ValueError("experts must share qtype/axis for EP stacking")
            self.qtype = w0.qtype
            self.axis = w0.axis
            self.float_dtype = w0.float_dtype
            self.activation_qtype = w0.activation_qtype
            self.data = nnx.Param(put(jnp.stack([w._data for w in weights])))
            self.scale = nnx.Param(put(jnp.stack([w._scale for w in weights])))
        elif isinstance(w0, WeightQBitsTpuArray) and w0.pad is None:
            self.kind = "qbits_tpu"
            self.qtype = w0.qtype
            self.group_size = w0.group_size
            self.orig_shape = w0.orig_shape
            self.float_dtype = w0.float_dtype
            self.k_shards = w0.k_shards
            self.data = nnx.Param(put(jnp.stack([w._packed for w in weights])))
            self.scale = nnx.Param(put(jnp.stack([w._scale_t for w in weights])))
            self.shift = nnx.Param(put(jnp.stack([w._shift_t for w in weights])))
        elif isinstance(w0, WeightQBitsTpuArray):
            # Off-envelope padded layout (`pad` set): the MoE kernels do not
            # carry the per-group activation padding, so stack dequantized
            # (correct, unoptimized). Family converters that pre-pad their
            # dims at quantize time (e.g. GPT-OSS) never hit this.
            self.kind = "float"
            self.data = nnx.Param(put(jnp.stack([_maybe_deq(w) for w in weights])))
        elif isinstance(w0, jnp.ndarray):
            self.kind = "float"
            self.data = nnx.Param(put(jnp.stack(list(weights))))
        else:
            # Generic packed WeightQBitsArray (interleaved rows) cannot be
            # sliced per-expert without unpacking; stack dequantized.
            self.kind = "float"
            self.data = nnx.Param(put(jnp.stack([_maybe_deq(w) for w in weights])))

    def leaves(self):
        if self.kind == "qbits_tpu":
            return (self.data.get_value(), self.scale.get_value(), self.shift.get_value())
        if self.kind == "qbytes":
            return (self.data.get_value(), self.scale.get_value())
        return (self.data.get_value(),)

    def apply(self, x: jnp.ndarray, leaves, j: int) -> jnp.ndarray:
        """x @ w_j.T for local expert j, via the normal quantized-op stack."""
        from ..ops.qlinear import qlinear

        if self.kind == "qbytes":
            data, scale = leaves
            w = WeightQBytesArray(
                _data=data[j], _scale=scale[j], qtype=self.qtype, axis=self.axis,
                float_dtype=self.float_dtype, activation_qtype=self.activation_qtype,
            )
        elif self.kind == "qbits_tpu":
            data, scale, shift = leaves
            w = WeightQBitsTpuArray(
                _packed=data[j], _scale_t=scale[j], _shift_t=shift[j],
                qtype=self.qtype, group_size=self.group_size,
                orig_shape=self.orig_shape, float_dtype=self.float_dtype,
                k_shards=getattr(self, "k_shards", 1),
            )
        else:
            w = leaves[0][j].astype(x.dtype)
        return qlinear(x, w)


class EPSparseMoeBlock(nnx.Module):
    """Drop-in replacement for a dense-mask sparse MoE block, expert-parallel.

    Built by `convert_moe_to_ep`; reuses the original block's `gate` (and,
    for Qwen2-MoE, `shared_expert`/`shared_expert_gate`) modules, which run
    replicated.
    """

    def __init__(
        self,
        block,
        mesh: Mesh,
        *,
        ep_axis: str = "ep",
        capacity_factor: Optional[float] = 2.0,
    ):
        experts = list(block.experts)
        num_experts = len(experts)
        ep = mesh.shape[ep_axis]
        if num_experts % ep != 0:
            raise ValueError(
                f"{num_experts} experts do not divide over ep={ep} devices"
            )
        self.mesh = mesh
        self.ep_axis = ep_axis
        self.capacity_factor = capacity_factor
        self.num_experts = num_experts
        self.top_k = block.top_k
        # Mixtral always renormalizes top-k probs; Qwen2-MoE only when
        # norm_topk_prob is set.
        self.norm_topk_prob = getattr(block, "norm_topk_prob", True)
        self.gate = block.gate
        self.shared_expert = getattr(block, "shared_expert", None)
        self.shared_expert_gate = getattr(block, "shared_expert_gate", None)

        names = ("w1", "w3", "w2") if hasattr(experts[0], "w1") else (
            "gate_proj", "up_proj", "down_proj")
        self.proj_gate = _StackedProj([_expert_weight(getattr(e, names[0])) for e in experts], mesh, ep_axis)
        self.proj_up = _StackedProj([_expert_weight(getattr(e, names[1])) for e in experts], mesh, ep_axis)
        self.proj_down = _StackedProj([_expert_weight(getattr(e, names[2])) for e in experts], mesh, ep_axis)

    def _capacity(self, n_tokens: int) -> int:
        if self.capacity_factor is None:
            return n_tokens
        c = math.ceil(self.capacity_factor * self.top_k * n_tokens / self.num_experts)
        c = min(n_tokens, max(1, c))
        # Round up to a sublane multiple so gathered tiles stay TPU-friendly.
        return min(n_tokens, -8 * (-c // 8)) if n_tokens >= 8 else c

    def _route(self, x: jnp.ndarray):
        """[B, T, H] -> (top_i [S, K] int, top_p [S, K] f32 combine weights);
        the mixtral/qwen family rule. DeepSeek's sigmoid/group router
        overrides (EPDeepseekMoE)."""
        B, T, H = x.shape
        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        S = B * T
        return top_i.reshape(S, self.top_k), top_p.reshape(S, self.top_k)

    def _combine_shared(self, x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
        if self.shared_expert is not None:
            shared = _maybe_deq(self.shared_expert(x))
            gate = jax.nn.sigmoid(
                _maybe_deq(self.shared_expert_gate(x)).astype(jnp.float32)
            )
            out = out + (gate * shared.astype(jnp.float32)).astype(x.dtype)
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H = x.shape
        S = B * T
        E = self.num_experts
        K = self.top_k
        ep = self.mesh.shape[self.ep_axis]
        local_e = E // ep
        cap = self._capacity(S)

        top_i, top_p = self._route(x)  # [S, K] each
        mask = jnp.sum(
            jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
            axis=-2,
        )  # [S, E]

        xf = x.reshape(S, H)
        maskf = mask

        projs = (self.proj_gate, self.proj_up, self.proj_down)
        leaves = tuple(p.leaves() for p in projs)
        leaf_specs = tuple(
            tuple(P(self.ep_axis, *([None] * (l.ndim - 1))) for l in ls)
            for ls in leaves
        )

        def kernel_dispatch(xf, maskf, top_i_f, top_p_f, g_leaves, u_leaves, d_leaves):
            """Per-shard stacked-kernel path (`ops/pallas/moe_mm`): the local
            expert index lives inside the Pallas grid, so no `data[j]` XLA
            slices (each of which materializes an HBM copy of the expert's
            weights before the per-expert pallas call — the round-3 2.5x
            decode regression, here avoided for EP exactly as for the
            single-device StackedSparseMoeBlock). Returns None when any
            projection is off the kernel envelope (caller loops instead)."""
            from ..ops import config as ops_config
            from ..ops.pallas import moe_mm

            if any(p.kind != "qbits_tpu" for p in projs):
                return None
            interp = ops_config.pallas_interpret()

            def mm(kind, xv, proj, ls, eids=None):
                kw = dict(k_shards=getattr(proj, "k_shards", 1), interpret=interp)
                if kind == "sel":
                    return moe_mm.qbits_moe_sel_call(
                        xv, eids, *ls, proj.qtype.bits, proj.group_size, **kw
                    )
                f = moe_mm.qbits_moe_all_call if kind == "all" else moe_mm.qbits_moe_prefill_call
                return f(xv, *ls, proj.qtype.bits, proj.group_size, **kw)

            if S * K < E and S * K <= moe_mm._SEL_MAX:
                # SELECTIVE per-shard decode (the V3 regime: top-8 of 256
                # routed over ep shards). Each shard keeps the routed pairs
                # whose expert lives in its slab (eids localized by the slab
                # offset); foreign pairs collapse onto local expert 0 with
                # zero combine weight (their stream is bounded by the tiny
                # pair count), and the psum over "ep" combines shards —
                # exact, and only the ROUTED experts' weights ever leave HBM.
                shard = jax.lax.axis_index(self.ep_axis)
                lo = shard * local_e
                eids = top_i_f.reshape(S * K)
                w = top_p_f.reshape(S * K)
                local = (eids >= lo) & (eids < lo + local_e)
                eids_l = jnp.where(local, eids - lo, 0).astype(jnp.int32)
                w = jnp.where(local, w, 0.0)
                order = jnp.argsort(eids_l)
                inv = jnp.argsort(order)
                x_sel = jnp.take(jnp.repeat(xf, K, axis=0), order, axis=0)
                eids_s = jnp.take(eids_l, order)
                g = mm("sel", x_sel, projs[0], g_leaves, eids_s)
                u = mm("sel", x_sel, projs[1], u_leaves, eids_s) if g is not None else None
                if u is not None:
                    h = (jax.nn.silu(g) * u).astype(x.dtype)
                    d = mm("sel", h, projs[2], d_leaves, eids_s)
                    if d is not None:
                        d = jnp.take(d, inv, axis=0)  # back to pair order
                        return (w[:, None] * d).reshape(S, K, H).sum(axis=1)
            if S <= 512 and (cap >= S or S <= 32):
                # All-experts branch is VMEM-resident (see the stacked
                # block): bounded S only; bigger S takes the tiled gather.
                pad = -S % 8
                xp = jnp.pad(xf, ((0, pad), (0, 0))) if pad else xf
                g3 = mm("all", xp, projs[0], g_leaves)
                u3 = mm("all", xp, projs[1], u_leaves) if g3 is not None else None
                if u3 is None:
                    return None
                h3 = (jax.nn.silu(g3) * u3).astype(x.dtype)
                d3 = mm("prefill", h3, projs[2], d_leaves)
                if d3 is None:
                    return None
                d3 = d3[:, :S, :] if pad else d3
                return jnp.einsum("esh,se->sh", d3, maskf.astype(jnp.float32))
            cap_g = min(cap, S)
            top_v, idx = jax.lax.top_k(maskf.T, cap_g)  # [local_e, cap_g]
            rpad = -cap_g % 8
            if rpad:
                idx = jnp.pad(idx, ((0, 0), (0, rpad)))
                top_v = jnp.pad(top_v, ((0, 0), (0, rpad)))
                cap_g += rpad
            xg = jnp.take(xf, idx.reshape(-1), axis=0).reshape(local_e, cap_g, H)
            g3 = mm("prefill", xg, projs[0], g_leaves)
            u3 = mm("prefill", xg, projs[1], u_leaves) if g3 is not None else None
            if u3 is None:
                return None
            h3 = (jax.nn.silu(g3) * u3).astype(x.dtype)
            d3 = mm("prefill", h3, projs[2], d_leaves)
            if d3 is None:
                return None
            acc = jnp.zeros((S, H), jnp.float32)
            for j in range(local_e):
                acc = acc.at[idx[j]].add(top_v[j][:, None] * d3[j])
            return acc

        def dispatch(xf, maskf, top_i_f, top_p_f, g_leaves, u_leaves, d_leaves):
            acc = kernel_dispatch(xf, maskf, top_i_f, top_p_f, g_leaves, u_leaves, d_leaves)
            if acc is None:
                acc = jnp.zeros((S, H), jnp.float32)
                for j in range(local_e):
                    w_col = maskf[:, j]  # local expert j's routing weights
                    if cap >= S:
                        # Capacity covers every token (decode/small batches
                        # after sublane rounding): gather/scatter is pure
                        # overhead — run the expert on all tokens,
                        # zero-weighted where unrouted. Exact.
                        h = jax.nn.silu(projs[0].apply(xf, g_leaves, j)) * projs[1].apply(xf, u_leaves, j)
                        y = projs[2].apply(h.astype(x.dtype), d_leaves, j)
                        acc = acc + w_col[:, None] * y.astype(jnp.float32)
                        continue
                    top_v, idx = jax.lax.top_k(w_col, cap)
                    xg = jnp.take(xf, idx, axis=0)
                    h = jax.nn.silu(projs[0].apply(xg, g_leaves, j)) * projs[1].apply(xg, u_leaves, j)
                    y = projs[2].apply(h.astype(x.dtype), d_leaves, j)
                    acc = acc.at[idx].add(top_v[:, None] * y.astype(jnp.float32))
            return jax.lax.psum(acc.astype(jnp.float32), self.ep_axis)

        out = jax.shard_map(
            dispatch,
            mesh=self.mesh,
            in_specs=(P(), P(None, self.ep_axis), P(), P()) + leaf_specs,
            out_specs=P(),
            axis_names={self.ep_axis},
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )(xf, maskf, top_i, top_p, *leaves)
        out = out.astype(x.dtype).reshape(B, T, H)
        return self._combine_shared(x, out)


class GatheredSparseMoeBlock(nnx.Module):
    """Single-device capacity-gather MoE dispatch.

    The dense-mask blocks run EVERY expert on ALL S tokens (E*S token-MLPs);
    at prefill that is E/top_k x the useful FLOPs and the MXU is the
    bottleneck. This block gathers, per expert, the top-`capacity` tokens by
    routing weight (static shapes: `lax.top_k` + `take`), runs the expert
    MLP on just those, and scatter-adds — E*capacity ~= cf*top_k*S token-MLPs,
    an E/(cf*top_k) prefill FLOP reduction with identical weights-streaming
    cost at decode. With ``capacity_factor=None`` it is exact vs dense-mask;
    with a finite factor, overflow tokens are dropped (standard capacity
    semantics).

    Keeps the ORIGINAL expert modules (quantized/frozen QLinears) and calls
    them directly: a stacked-weight layout here would force XLA to
    materialize each expert's `data[j]` slice as a separate buffer before
    every Pallas call — an HBM->HBM copy of the full expert weights per step
    that measured 2.5x the dense-mask decode time (bench/moe_bench.py).
    Stacking is only for `EPSparseMoeBlock`, which needs one leaf to shard
    over the "ep" axis. When token counts are small enough that capacity
    covers every token (decode), the gather/scatter machinery is skipped
    entirely and the dense-mask math runs (exact, zero overhead).
    """

    def __init__(self, block, *, capacity_factor: Optional[float] = 2.0):
        self.capacity_factor = capacity_factor
        self.num_experts = len(block.experts)
        self.top_k = block.top_k
        self.norm_topk_prob = getattr(block, "norm_topk_prob", True)
        self.gate = block.gate
        self.experts = block.experts
        self.shared_expert = getattr(block, "shared_expert", None)
        self.shared_expert_gate = getattr(block, "shared_expert_gate", None)

    _capacity = EPSparseMoeBlock._capacity

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H = x.shape
        S = B * T
        E = self.num_experts
        cap = self._capacity(S)

        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        mask = jnp.sum(
            jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
            axis=-2,
        )  # [B, T, E]

        if cap >= S:
            # Decode/small-batch: capacity covers every token after sublane
            # rounding — dense-mask math, no gather/scatter.
            out = jnp.zeros_like(x)
            for e, expert in enumerate(self.experts):
                out = out + (mask[..., e : e + 1] * expert(x).astype(jnp.float32)).astype(x.dtype)
        else:
            xf = x.reshape(S, H)
            maskf = mask.reshape(S, E)
            acc = jnp.zeros((S, H), jnp.float32)
            for j, expert in enumerate(self.experts):
                top_v, idx = jax.lax.top_k(maskf[:, j], cap)
                xg = jnp.take(xf, idx, axis=0)
                y = expert(xg)
                acc = acc.at[idx].add(top_v[:, None] * y.astype(jnp.float32))
            out = acc.astype(x.dtype).reshape(B, T, H)

        if self.shared_expert is not None:
            shared = _maybe_deq(self.shared_expert(x))
            gate = jax.nn.sigmoid(
                _maybe_deq(self.shared_expert_gate(x)).astype(jnp.float32)
            )
            out = out + (gate * shared.astype(jnp.float32)).astype(x.dtype)
        return out


def _stack_expert_projs(experts, names, who: str):
    """Stack (gate/up/down)-style expert projections for the single-device
    stacked dispatch; shared by the stacked block families."""
    projs = []
    for name in names:
        ws = [_expert_weight(getattr(e, name)) for e in experts]
        if not all(isinstance(w, WeightQBitsTpuArray) for w in ws):
            raise ValueError(
                f"{who} needs frozen sub-byte experts (WeightQBitsTpuArray); "
                "quantize+freeze with qint4/qint2 first, or use "
                "GatheredSparseMoeBlock"
            )
        projs.append(_StackedProj(ws, None, None))
    return projs


class StackedSparseMoeBlock(nnx.Module):
    """Single-device stacked-expert dispatch through the MoE Pallas kernels
    (`ops/pallas/moe_mm`): the expert index lives inside the kernel grid, so
    expert weights are DMA'd straight from ONE stacked [E, ...] HBM array —
    no per-expert XLA slices (the round-3 HBM-copy regression) and, at small
    decode batches, no streaming of unrouted experts at all.

    Route selection per step (S = B*T tokens, K = top_k):
    - S*K < E  -> SELECTIVE: scalar-prefetched gemv per (token, slot) pair;
      streams only the routed experts (~E/(S*K) x less MLP weight traffic —
      the decode regime VERDICT round-3 #4 flagged as unmeasured).
    - capacity >= S -> ALL-EXPERTS: dense-mask math over the stacked array
      (every expert streams once, exact).
    - else (prefill) -> CAPACITY GATHER: per-expert top-`cap` token slabs
      [E, cap, H] through the batched-expert GEMM kernel.

    Requires frozen sub-byte experts (`WeightQBitsTpuArray`); the converter
    refuses anything else. Storage is the stacked layout ONLY (a 13.6B-total
    int4 model cannot hold two copies of 6.8 GB of expert weights).
    """

    def __init__(self, block, *, capacity_factor: Optional[float] = 2.0):
        self.capacity_factor = capacity_factor
        self.num_experts = len(block.experts)
        self.top_k = block.top_k
        self.norm_topk_prob = getattr(block, "norm_topk_prob", True)
        self.gate = block.gate
        self.shared_expert = getattr(block, "shared_expert", None)
        self.shared_expert_gate = getattr(block, "shared_expert_gate", None)
        experts = list(block.experts)
        names = ("w1", "w3", "w2") if hasattr(experts[0], "w1") else (
            "gate_proj", "up_proj", "down_proj")
        self.proj_gate, self.proj_up, self.proj_down = _stack_expert_projs(
            experts, names, "StackedSparseMoeBlock"
        )

    _capacity = EPSparseMoeBlock._capacity

    def _glu(self, g, u):
        """Gate/up combination; the llama-family SwiGLU by default. Family
        subclasses override (e.g. gpt-oss's clamped variant)."""
        return jax.nn.silu(g) * u

    def _post_mm(self, which, y, eids=None, _expert=None):
        """Hook after each projection matmul (f32 [..., N]); `which` in
        {gate, up, down}. `eids` is the per-row expert table on the
        selective path; `_expert` the single expert index on the dense
        fallback; both None on the expert-leading [E, M, N] paths. Default
        identity; subclasses add per-expert biases here."""
        return y

    def _mm(self, kind, x, proj, eids=None):
        """One stacked projection through the matching MoE kernel; returns
        None when outside the kernel envelope (caller falls back)."""
        from ..ops import config as ops_config
        from ..ops.pallas import moe_mm

        data = proj.data.get_value()
        scale = proj.scale.get_value()
        shift = proj.shift.get_value()
        kw = dict(
            bits=proj.qtype.bits, group_size=proj.group_size,
            k_shards=getattr(proj, "k_shards", 1),
            interpret=ops_config.pallas_interpret(),
        )
        if kind == "sel":
            return moe_mm.qbits_moe_sel_call(x, eids, data, scale, shift, **kw)
        if kind == "all":
            return moe_mm.qbits_moe_all_call(x, data, scale, shift, **kw)
        if kind == "uniq":  # all-experts math over U slots -> W[eids[u]]
            return moe_mm.qbits_moe_all_call(x, data, scale, shift, eids=eids, **kw)
        if kind == "uniq_prefill":  # per-slot inputs -> W[eids[u]]
            return moe_mm.qbits_moe_prefill_call(x, data, scale, shift, eids=eids, **kw)
        return moe_mm.qbits_moe_prefill_call(x, data, scale, shift, **kw)

    def _apply_proj(self, proj, leaves, x, e):
        """Single-expert XLA application (fallback path); subclasses wrap
        with input padding / output slicing when their weights are padded."""
        return proj.apply(x, leaves, e)

    def _dense_fallback(self, x, mask):
        """XLA dense-mask math via per-expert stacked slices (correctness
        fallback off the kernel envelope, e.g. tiny CPU test shapes)."""
        projs = (self.proj_gate, self.proj_up, self.proj_down)
        leaves = tuple(p.leaves() for p in projs)
        out = jnp.zeros_like(x)
        for e in range(self.num_experts):
            g = self._post_mm("gate", self._apply_proj(projs[0], leaves[0], x, e), _expert=e)
            u = self._post_mm("up", self._apply_proj(projs[1], leaves[1], x, e), _expert=e)
            y = self._post_mm(
                "down",
                self._apply_proj(projs[2], leaves[2], self._glu(g, u).astype(x.dtype), e),
                _expert=e,
            )
            out = out + (mask[..., e : e + 1] * y.astype(jnp.float32)).astype(x.dtype)
        return out

    def _route(self, x: jnp.ndarray):
        """[B, T, H] -> (top_i [S, K] int, top_p [S, K] f32 combine weights).
        The mixtral/qwen family rule: softmax -> top-k -> (renormalize)."""
        B, T, H = x.shape
        logits = _maybe_deq(self.gate(x)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        S = B * T
        return top_i.reshape(S, self.top_k), top_p.reshape(S, self.top_k)

    def _combine_shared(self, x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
        """Add the family's shared-expert contribution (qwen2-moe style:
        sigmoid-gated shared expert; none for mixtral)."""
        if self.shared_expert is not None:
            shared = _maybe_deq(self.shared_expert(x))
            gate = jax.nn.sigmoid(
                _maybe_deq(self.shared_expert_gate(x)).astype(jnp.float32)
            )
            out = out + (gate * shared.astype(jnp.float32)).astype(x.dtype)
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H = x.shape
        top_i, top_p = self._route(x)
        out = self._dispatch(x, top_i, top_p).reshape(B, T, H)
        return self._combine_shared(x, out)

    def _all_math(self, xp, top_i, top_p, S):
        """All-experts dense-mask math over the stacked array: gate/up via
        the all-experts kernel, down via the batched-expert GEMM, combined
        with the [S, E] routing mask. xp is the sublane-padded [Sp, H]
        activations; returns [S, H] f32 or None off the kernel envelope."""
        E = self.num_experts
        g3 = self._mm("all", xp, self.proj_gate)
        u3 = self._mm("all", xp, self.proj_up) if g3 is not None else None
        if u3 is None:
            return None
        g3 = self._post_mm("gate", g3)
        u3 = self._post_mm("up", u3)
        h3 = self._glu(g3, u3).astype(xp.dtype)  # [E, Sp, I]
        # The down projection is per-expert on per-expert inputs: the
        # batched-expert GEMM kernel covers it (M tile = Sp).
        d3 = self._mm("prefill", h3, self.proj_down)
        if d3 is None:
            return None
        d3 = self._post_mm("down", d3)
        mask = jnp.sum(
            jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
            axis=-2,
        ).reshape(S, E)
        d3 = d3[:, :S, :] if d3.shape[1] > S else d3
        return jnp.einsum("esh,se->sh", d3, mask)

    def _uniq_math(self, xp, top_i, top_p, S, uids, valid):
        """Unique-expert dedup math: the all-experts computation over U
        SLOTS, slot u reading W[uids[u]] via scalar prefetch, combined with
        the slot-gathered routing mask (padded slots carry zero weight).
        Returns [S, H] f32 or None off the kernel envelope."""
        E = self.num_experts
        U = uids.shape[0]
        g3 = self._mm("uniq", xp, self.proj_gate, uids)
        u3 = self._mm("uniq", xp, self.proj_up, uids) if g3 is not None else None
        if u3 is None:
            return None
        g3 = self._post_mm("gate", g3, eids=uids)
        u3 = self._post_mm("up", u3, eids=uids)
        h3 = self._glu(g3, u3).astype(xp.dtype)  # [U, Sp, I]
        d3 = self._mm("uniq_prefill", h3, self.proj_down, uids)
        if d3 is None:
            return None
        d3 = self._post_mm("down", d3, eids=uids)
        mask = jnp.sum(
            jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
            axis=-2,
        ).reshape(S, E)
        maskg = jnp.take(mask, uids, axis=1) * valid[None, :]  # [S, U]
        d3 = d3[:, :S, :] if d3.shape[1] > S else d3
        return jnp.einsum("ush,su->sh", d3, maskg)

    def _uniq_boundary(self, xp, top_i, top_p, S):
        """lax.cond between the U-slot unique-dedup route and the full
        all-experts route, predicated on the RUNTIME unique-expert count of
        this step's routing (U = 3E/4 slots; measured: scalar-prefetched
        index maps re-fetch duplicate blocks, so dedup must happen at the
        slot level — RESULTS.md round-4 addendum). Returns [S, H] f32 or
        None when either branch is off the kernel envelope."""
        E, K = self.num_experts, self.top_k
        U = max(1, (3 * E) // 4)
        eids = top_i.reshape(-1)
        sorted_e = jnp.sort(eids)
        nuniq = 1 + jnp.sum(sorted_e[1:] != sorted_e[:-1])
        uids = jnp.unique(eids, size=U, fill_value=0).astype(jnp.int32)
        valid = (jnp.arange(U) < nuniq).astype(jnp.float32)

        def uniq_branch(ops):
            xp, top_i, top_p, uids, valid = ops
            return self._uniq_math(xp, top_i, top_p, S, uids, valid)

        def all_branch(ops):
            xp, top_i, top_p, uids, valid = ops
            return self._all_math(xp, top_i, top_p, S)

        ops = (xp, top_i, top_p, uids, valid)
        try:  # kernel-envelope probe: abstract-eval both branches
            if jax.eval_shape(uniq_branch, ops) is None:
                return None
            if jax.eval_shape(all_branch, ops) is None:
                return None
        except Exception:
            return None
        return jax.lax.cond(nuniq <= U, uniq_branch, all_branch, ops)

    def _dispatch(self, x: jnp.ndarray, top_i: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
        """Routed-expert dispatch core shared by the family subclasses:
        top_i/top_p are [S, K] flat routing tables. Returns [S, H]."""
        B, T, H = x.shape
        S = B * T
        E = self.num_experts
        K = self.top_k
        cap = self._capacity(S)
        top_i = top_i.reshape(S, K)
        top_p = top_p.reshape(S, K)

        xf = x.reshape(S, H)
        out = None
        from ..ops.pallas.moe_mm import _SEL_MAX

        if S * K < E and S * K <= _SEL_MAX:
            # SELECTIVE: stream only the routed experts (<= _SEL_MAX pairs — the
            # kernel computes ceil8(nsel) padded rows per pair, free under
            # the streaming bound while nsel << E; larger fan-outs lose the
            # quadratic row trade and go all-experts).
            # Pairs are SORTED by expert id so duplicate experts sit on
            # adjacent innermost grid steps. NOTE (measured, round 4): the
            # Mosaic pipeline does NOT skip re-fetches for equal block
            # indices under scalar-prefetched index maps (1-unique vs
            # 8-unique eids differ by only 6% at the gate/up shape), so
            # duplicates still stream — which is why the gate stays STRICT
            # (S*K < E): at S*K == E the all-experts path below streams the
            # same expert count with zero duplicates. The sort stays: it is
            # ~free and becomes a win if Mosaic learns the runtime skip.
            x_sel = jnp.repeat(xf, K, axis=0)  # [S*K, H]
            eids = top_i.reshape(S * K)
            order = jnp.argsort(eids)
            inv = jnp.argsort(order)
            x_sel = jnp.take(x_sel, order, axis=0)
            eids_s = jnp.take(eids, order)
            g = self._mm("sel", x_sel, self.proj_gate, eids_s)
            u = self._mm("sel", x_sel, self.proj_up, eids_s) if g is not None else None
            if u is not None:
                g = self._post_mm("gate", g, eids_s)
                u = self._post_mm("up", u, eids_s)
                h = self._glu(g, u).astype(x.dtype)
                d = self._mm("sel", h, self.proj_down, eids_s)
                if d is not None:
                    d = self._post_mm("down", d, eids_s)
                    d = jnp.take(d, inv, axis=0)  # back to pair order
                    w = top_p.reshape(S * K, 1)
                    out = (w * d).reshape(S, K, H).sum(axis=1)
        if out is None and S <= 512 and (cap >= S or S <= 32):
            # ALL-EXPERTS (decode/small-batch): dense-mask math, copy-free.
            # Taken whenever capacity covers every token OR the batch is too
            # small for the capacity-gather prefill path to win (at small S
            # every expert streams once either way, and tiny per-expert M
            # falls off the prefill kernel's tile envelope — round-4 bench:
            # B=4 routed to the XLA stacked-slice fallback at 32 ms/step vs
            # 12.6 for this path). S is bounded: the all-experts kernel
            # holds x and an [S, bn] out block VMEM-resident (decode-kernel
            # style); larger S — incl. capacity_factor=None exact prefill,
            # where cap == S — goes through the M-TILED gather branch below.
            pad = -S % 8
            xp = jnp.pad(xf, ((0, pad), (0, 0))) if pad else xf
            if E >= 8 and E <= S * K <= 2 * E:
                # BOUNDARY DEDUP (VERDICT round-4 #6): at S*K just past the
                # selective gate the number of UNIQUE routed experts is
                # often < E; a lax.cond streams only U = 3E/4 expert
                # payloads when the routing allows, else the full all route.
                out = self._uniq_boundary(xp, top_i, top_p, S)
            if out is None:
                out = self._all_math(xp, top_i, top_p, S)
            if out is not None:
                out = out.astype(x.dtype)
        if out is None:
            # CAPACITY GATHER through the M-tiled batched-expert kernel.
            # cap_g == S (cf=None or sublane-rounded coverage) gathers every
            # token per expert — exact, and the kernel tiles M so any S
            # works; rows are padded to the sublane multiple with zero
            # routing weight (contributes nothing to the scatter-add).
            cap_g = min(cap, S)
            mask = jnp.sum(
                jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
                axis=-2,
            ).reshape(S, E)
            top_v, idx = jax.lax.top_k(mask.T, cap_g)  # [E, cap_g]
            rpad = -cap_g % 8
            if rpad:
                idx = jnp.pad(idx, ((0, 0), (0, rpad)))
                top_v = jnp.pad(top_v, ((0, 0), (0, rpad)))
                cap_g += rpad
            xg = jnp.take(xf, idx.reshape(-1), axis=0).reshape(E, cap_g, H)
            g3 = self._mm("prefill", xg, self.proj_gate)
            u3 = self._mm("prefill", xg, self.proj_up) if g3 is not None else None
            if u3 is not None:
                g3 = self._post_mm("gate", g3)
                u3 = self._post_mm("up", u3)
                h3 = self._glu(g3, u3).astype(x.dtype)
                d3 = self._mm("prefill", h3, self.proj_down)
                if d3 is not None:
                    d3 = self._post_mm("down", d3)
                    acc = jnp.zeros((S, H), jnp.float32)
                    for e in range(E):
                        acc = acc.at[idx[e]].add(top_v[e][:, None] * d3[e])
                    out = acc.astype(x.dtype)
        if out is None:
            mask = jnp.sum(
                jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None],
                axis=-2,
            ).reshape(S, E)
            out = self._dense_fallback(xf, mask)
        return out.astype(x.dtype)


class StackedDeepseekMoE(StackedSparseMoeBlock):
    """DeepSeek-V3 variant of the stacked dispatch: the sigmoid/group-limited
    router returns (indices, weights) directly (selection-bias + routed
    scaling already applied), and the always-on shared experts replace the
    qwen2-style gated shared expert. At V3 routing shapes (top-8 of 256),
    single-stream decode streams 8 of 256 experts — a 32x expert-weight
    traffic cut over any dense dispatch."""

    def __init__(self, block, *, capacity_factor: Optional[float] = 2.0):
        # block: models.deepseek_v3.DeepseekV3MoE
        self.capacity_factor = capacity_factor
        self.num_experts = block.n_routed_experts
        self.top_k = block.gate.top_k
        self.norm_topk_prob = False  # router handles its own normalization
        self.gate = block.gate
        self.shared_expert = None
        self.shared_expert_gate = None
        self.shared_experts = block.shared_experts
        self.proj_gate, self.proj_up, self.proj_down = _stack_expert_projs(
            list(block.experts), ("gate_proj", "up_proj", "down_proj"),
            "StackedDeepseekMoE",
        )

    def _route(self, x: jnp.ndarray):
        B, T, H = x.shape
        top_i, top_w = self.gate(x.reshape(-1, H))  # [S, K] each
        return top_i, top_w.astype(jnp.float32)

    def _combine_shared(self, x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
        return out + _maybe_deq(self.shared_experts(x)).astype(out.dtype)


class EPDeepseekMoE(EPSparseMoeBlock):
    """Expert-parallel DeepSeek-V3 MoE: the stacked [E, ...] sub-byte expert
    arrays shard over "ep" (per-device slabs of E/ep experts — at V3 scale,
    256 routed experts' int4 weights exceed one chip's HBM), the sigmoid/
    group-limited router runs replicated, and decode takes the per-shard
    SELECTIVE path (each shard streams only the routed pairs in its slab;
    psum combines). Shared experts run replicated like the attention."""

    def __init__(
        self,
        block,
        mesh: Mesh,
        *,
        ep_axis: str = "ep",
        capacity_factor: Optional[float] = 2.0,
    ):
        # block: models.deepseek_v3.DeepseekV3MoE
        ep = mesh.shape[ep_axis]
        if block.n_routed_experts % ep != 0:
            raise ValueError(
                f"{block.n_routed_experts} experts do not divide over ep={ep} devices"
            )
        self.mesh = mesh
        self.ep_axis = ep_axis
        self.capacity_factor = capacity_factor
        self.num_experts = block.n_routed_experts
        self.top_k = block.gate.top_k
        self.norm_topk_prob = False  # router handles its own normalization
        self.gate = block.gate
        self.shared_expert = None
        self.shared_expert_gate = None
        self.shared_experts = block.shared_experts
        experts = list(block.experts)
        names = ("gate_proj", "up_proj", "down_proj")
        self.proj_gate = _StackedProj([_expert_weight(getattr(e, names[0])) for e in experts], mesh, ep_axis)
        self.proj_up = _StackedProj([_expert_weight(getattr(e, names[1])) for e in experts], mesh, ep_axis)
        self.proj_down = _StackedProj([_expert_weight(getattr(e, names[2])) for e in experts], mesh, ep_axis)

    def _route(self, x: jnp.ndarray):
        B, T, H = x.shape
        top_i, top_w = self.gate(x.reshape(-1, H))  # [S, K] each
        return top_i, top_w.astype(jnp.float32)

    def _combine_shared(self, x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
        return out + _maybe_deq(self.shared_experts(x)).astype(out.dtype)


class StackedGptOssMoE(StackedSparseMoeBlock):
    """GPT-OSS variant: the HF checkpoint stores experts as FUSED bf16
    Params ([E, H, 2I] interleaved gate/up + [E, I, H] down, all biased) —
    plain Parameters that neither the torch reference nor our module swap
    would ever quantize. This block QUANTIZES them: each expert's gate/up/
    down de-interleaves into torch-convention [out, in] weights, quantizes
    per-expert (sub-byte group-wise), and stacks into the kernel layout —
    the routed-expert memory drops ~4x at int4 AND small-batch decode rides
    the selective streaming path. The clamped-SwiGLU epilogue
    (`(clip(up)+1) * gate*sigmoid(1.702*gate)`) and the per-expert biases
    run as XLA epilogues via the `_glu`/`_post_mm` hooks.

    Kernel envelope note: the sub-byte kernels need the contraction dim in
    512-element blocks (w16 packing x 128 lanes), so weights are ZERO-PADDED
    to the next 1024 multiple at quantize time and activations are padded to
    match inside `_mm` — exact (pad groups quantize to ~0 and multiply zero
    activation columns), and it makes off-envelope dims like the released
    20b's hidden 2880 kernel-eligible (2880 -> 3072).
    """

    def __init__(self, block, *, weights="qint4", group_size: int = 128,
                 capacity_factor: Optional[float] = 2.0):
        # block: models.gpt_oss.GptOssMLP
        from .. import MaxOptimizer, quantize_weight, qtypes as _qtypes
        from ..tensor.weights import WeightQBitsTpuArray as _W

        qt_ = _qtypes[weights] if isinstance(weights, str) else weights
        router = block.router
        self.capacity_factor = capacity_factor
        self.num_experts = router.num_experts
        self.top_k = router.top_k
        self.norm_topk_prob = False
        self.gate = router
        self.shared_expert = None
        self.shared_expert_gate = None
        ex = block.experts
        self._alpha = ex.alpha
        self._limit = ex.limit
        gu = ex.gate_up_proj.get_value()  # [E, H, 2I]
        gu_b = ex.gate_up_proj_bias.get_value()  # [E, 2I]
        dn = ex.down_proj.get_value()  # [E, I, H]
        dn_b = ex.down_proj_bias.get_value()  # [E, H]

        def quant(w):  # torch-convention [out, in] float -> frozen sub-byte
            kpad = -w.shape[1] % 1024  # kernel envelope (see class docstring)
            npad = -w.shape[0] % 128  # out dim must tile to 128 lanes too
            if kpad or npad:
                w = jnp.pad(w, ((0, npad), (0, kpad)))
            scale, shift = MaxOptimizer()(w, qt_, axis=0, group_size=group_size)
            q = quantize_weight(w, qt_, 0, scale, shift=shift, group_size=group_size)
            tpu = _W.from_generic(q)
            assert tpu is not None, (w.shape, qt_, group_size)
            return tpu

        gates, ups, downs = [], [], []
        for e in range(self.num_experts):
            gates.append(quant(jnp.transpose(gu[e][:, 0::2])))  # [I, H]
            ups.append(quant(jnp.transpose(gu[e][:, 1::2])))
            downs.append(quant(jnp.transpose(dn[e])))  # [H, I]
        self.proj_gate = _StackedProj(gates, None, None)
        self.proj_up = _StackedProj(ups, None, None)
        self.proj_down = _StackedProj(downs, None, None)
        # True (unpadded) out dims: _mm slices the padded kernel output.
        inter = gu.shape[2] // 2
        self._true_n = {"gate": inter, "up": inter, "down": dn.shape[2]}
        self.bias_gate = nnx.Param(gu_b[:, 0::2].astype(jnp.float32))  # [E, I]
        self.bias_up = nnx.Param(gu_b[:, 1::2].astype(jnp.float32))
        self.bias_down = nnx.Param(dn_b.astype(jnp.float32))  # [E, H]

    def _which(self, proj):
        if proj is self.proj_gate:
            return "gate"
        return "up" if proj is self.proj_up else "down"

    def _mm(self, kind, x, proj, eids=None):
        # Zero-pad the contraction dim to the (padded) weight K; slice the
        # output back to the true (unpadded) out dim.
        K = proj.orig_shape[1]
        if x.shape[-1] < K:
            widths = ((0, 0),) * (x.ndim - 1) + ((0, K - x.shape[-1]),)
            x = jnp.pad(x, widths)
        y = super()._mm(kind, x, proj, eids)
        if y is None:
            return None
        n = self._true_n[self._which(proj)]
        return y[..., :n] if y.shape[-1] > n else y

    def _route(self, x: jnp.ndarray):
        B, T, H = x.shape
        # router.topk avoids the dense [S, E] scatter+gather round trip.
        top_i, top_p = self.gate.topk(x.reshape(-1, H))
        return top_i, top_p.astype(jnp.float32)

    def _glu(self, g, u):
        g = jnp.minimum(g, self._limit)
        u = jnp.clip(u, -self._limit, self._limit)
        return (u + 1.0) * (g * jax.nn.sigmoid(g * self._alpha))

    def _post_mm(self, which, y, eids=None, _expert=None):
        b = {
            "gate": self.bias_gate, "up": self.bias_up, "down": self.bias_down,
        }[which].get_value()
        if eids is not None:
            be = jnp.take(b, eids, axis=0).astype(y.dtype)
            if y.ndim == 3:  # uniq route: per-slot bias over [U, Sp, N]
                return y + be[:, None, :]
            return y + be  # selective: per-row expert bias [nsel, N]
        if _expert is not None:  # dense fallback: single expert
            return y + b[_expert].astype(y.dtype)
        return y + b[:, None, :].astype(y.dtype)  # [E, M, N] paths

    def _apply_proj(self, proj, leaves, x, e):
        K = proj.orig_shape[1]
        if x.shape[-1] < K:
            x = jnp.pad(x, ((0, 0), (0, K - x.shape[-1])))
        y = proj.apply(x, leaves, e)
        n = self._true_n[self._which(proj)]
        return y[..., :n] if y.shape[-1] > n else y

    def _combine_shared(self, x, out):
        return out  # gpt-oss has no shared expert


def _convert_moe(model, make_block, extra_types=()) -> int:
    from ..models.mixtral import MixtralSparseMoeBlock
    from ..models.qwen2_moe import Qwen2MoeSparseBlock
    from ..models.qwen3 import Qwen3MoeSparseBlock

    types = (
        MixtralSparseMoeBlock, Qwen2MoeSparseBlock, Qwen3MoeSparseBlock,
    ) + tuple(extra_types)
    converted = 0
    seen = set()
    for path, node in list(nnx.iter_graph(model)):
        if not isinstance(node, types):
            continue
        if id(node) in seen:
            continue
        seen.add(id(node))
        new_block = make_block(node)
        if new_block is None:  # converter declines this block type
            continue
        parent = model
        for p in path[:-1]:
            parent = parent[p] if isinstance(p, int) else getattr(parent, p)
        attr = path[-1]
        if isinstance(attr, int):
            parent[attr] = new_block
        else:
            setattr(parent, attr, new_block)
        converted += 1
    return converted


def convert_moe_to_gathered(model, *, capacity_factor: Optional[float] = 2.0) -> int:
    """Replace every dense-mask sparse MoE block with a single-device
    `GatheredSparseMoeBlock` (capacity-gather dispatch — the prefill FLOP
    fix). Apply AFTER quantize/freeze/load, like `convert_moe_to_ep`."""
    return _convert_moe(
        model, lambda b: GatheredSparseMoeBlock(b, capacity_factor=capacity_factor)
    )


def convert_moe_to_stacked(model, *, capacity_factor: Optional[float] = 2.0) -> int:
    """Replace every dense-mask sparse MoE block with the stacked-expert
    Pallas dispatch (`StackedSparseMoeBlock`, or `StackedDeepseekMoE` for
    DeepSeek-V3's sigmoid-routed blocks): selective streaming at small
    decode batches, copy-free dense-mask at larger ones, batched-expert
    capacity GEMM at prefill. Requires frozen sub-byte experts; apply AFTER
    quantize/freeze/load."""
    from ..models.deepseek_v3 import DeepseekV3MoE

    def make(block):
        if isinstance(block, DeepseekV3MoE):
            return StackedDeepseekMoE(block, capacity_factor=capacity_factor)
        return StackedSparseMoeBlock(block, capacity_factor=capacity_factor)

    return _convert_moe(model, make, extra_types=(DeepseekV3MoE,))


def convert_gpt_oss_moe_to_stacked(
    model, *, weights="qint4", group_size: int = 128,
    capacity_factor: Optional[float] = 2.0,
) -> int:
    """Quantize every GPT-OSS fused-expert MLP into the stacked sub-byte
    kernel layout (`StackedGptOssMoE`). Unlike the other converters this
    one QUANTIZES as it converts (the fused expert Params are not Linears,
    so `quantize()` never touches them); run it after quantize/freeze of
    the rest of the model."""
    from ..models.gpt_oss import GptOssMLP

    def make(block):
        if not isinstance(block, GptOssMLP):
            return None  # foreign MoE families: leave untouched
        return StackedGptOssMoE(
            block, weights=weights, group_size=group_size,
            capacity_factor=capacity_factor,
        )

    return _convert_moe(model, make, extra_types=(GptOssMLP,))


def convert_moe_to_ep(
    model,
    mesh: Mesh,
    *,
    ep_axis: str = "ep",
    capacity_factor: Optional[float] = 2.0,
) -> int:
    """Replace every dense-mask sparse MoE block in `model` with an
    `EPSparseMoeBlock` (or `EPDeepseekMoE` for DeepSeek-V3's sigmoid-routed
    blocks) sharded over `mesh[ep_axis]`. Returns the number of blocks
    converted. Apply AFTER quantize/freeze/load; re-apply sharding rules for
    the non-MoE weights separately (`shard_model`)."""
    from ..models.deepseek_v3 import DeepseekV3MoE

    def make(block):
        if isinstance(block, DeepseekV3MoE):
            return EPDeepseekMoE(
                block, mesh, ep_axis=ep_axis, capacity_factor=capacity_factor
            )
        return EPSparseMoeBlock(
            block, mesh, ep_axis=ep_axis, capacity_factor=capacity_factor
        )

    return _convert_moe(model, make, extra_types=(DeepseekV3MoE,))
