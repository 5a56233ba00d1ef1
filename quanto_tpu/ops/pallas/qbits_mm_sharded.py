"""Mesh-partitioned dispatch of the fused sub-byte matmul kernels.

Pallas calls are opaque to XLA's SPMD partitioner: under a `Mesh`, a plain
`pallas_call` would force its operands to be all-gathered (which is why
round 1 disabled the kernels whenever a mesh was active —
`ops/config.py:_single_device_ok`). This module wraps the kernel dispatch in
`jax.experimental.custom_partitioning` so the kernel runs *per device* on
its local shard with XLA inserting only the collectives the math needs:

- weights sharded along N (column-parallel): every device computes its own
  output columns — no collective;
- weights sharded along packed-K (row-parallel, block-local layout with
  `k_shards` = axis size): every device computes a partial [M, N] product
  from its own K blocks and the results `psum` over the axis;
- replicated weights: batch-parallel only.

The reference has no distributed capability (SURVEY.md §2.10); this is the
TPU-native analogue of what Megatron-style sharded inference engines do with
NCCL, expressed through XLA's partitioner instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from .qbits_mm import (
    _word_vals,
    qbits_int8_matmul_kernel_call,
    qbits_matmul_kernel_call,
    unpack_split_half,
)


__all__ = ["qbits_mm_partitioned"]


def _local_mm(x2, packed, scale_t, shift_t, bits, group_size, k_shards, interpret):
    """One device's full computation on (possibly local) shards.

    Tries the fused Pallas kernel; outside its envelope, falls back to an
    XLA dequant-matmul on the same local shards (still no replication).
    Always returns float32 [M, N]; W4A8 activation scale is applied by the
    caller (scalar, commutes with the psum).
    """
    if x2.dtype == jnp.int8:
        out = qbits_int8_matmul_kernel_call(
            x2, jnp.float32(1.0), packed, scale_t, shift_t, bits, group_size,
            jnp.float32, k_shards=k_shards, interpret=interpret,
        )
        if out is not None:
            return out
    else:
        # Keep x in its own dtype (bf16 x keeps the kernel on the bf16 MXU
        # rate); partials are cast up so the cross-device psum runs in f32.
        out = qbits_matmul_kernel_call(
            x2, packed, scale_t, shift_t, bits, group_size,
            k_shards=k_shards, interpret=interpret,
        )
        if out is not None:
            return out.astype(jnp.float32)
    xf = x2.astype(jnp.float32)
    N, Kp = packed.shape
    vals = _word_vals(packed.dtype, bits)
    K = Kp * vals
    gs = group_size if group_size is not None else K
    codes = unpack_split_half(packed, bits, K, k_shards).astype(jnp.float32)
    deq = codes * jnp.repeat(scale_t.T, gs, axis=1) - jnp.repeat(shift_t.T, gs, axis=1)
    return xf @ deq.T


@functools.partial(custom_partitioning, static_argnums=(4, 5, 6, 7))
def _qbits_mm_p(x2, packed, scale_t, shift_t, bits, group_size, k_shards, interpret):
    # Unpartitioned path (single device, or inside an already-manual region).
    return _local_mm(x2, packed, scale_t, shift_t, bits, group_size, k_shards, interpret)


def _spec2(sharding, ndim=2):
    spec = tuple(sharding.spec) if sharding is not None else ()
    return spec + (None,) * (ndim - len(spec))


def _axis_size(mesh, ax):
    if ax is None:
        return 1
    if isinstance(ax, (tuple, list)):
        n = 1
        for a in ax:
            n *= mesh.shape[a]
        return n
    return mesh.shape[ax]


def _partition(bits, group_size, k_shards, interpret, mesh, arg_shapes, result_shape):
    x_s, p_s, _, _ = [a.sharding for a in arg_shapes]
    n_ax, j_ax = _spec2(p_s)
    m_ax = _spec2(x_s)[0]
    tp_j = _axis_size(mesh, j_ax)
    if j_ax is not None and (k_shards % tp_j != 0 or tp_j == 1):
        # Payload not block-aligned for this axis (or trivially sharded):
        # replicate K rather than compute wrong partials.
        j_ax, tp_j = None, 1
    ks_local = k_shards // tp_j
    arg_shardings = (
        NamedSharding(mesh, P(m_ax, j_ax)),
        NamedSharding(mesh, P(n_ax, j_ax)),
        NamedSharding(mesh, P(j_ax, n_ax)),
        NamedSharding(mesh, P(j_ax, n_ax)),
    )
    out_sharding = NamedSharding(mesh, P(m_ax, n_ax))

    def lower_fn(x2, packed, scale_t, shift_t):
        out = _local_mm(x2, packed, scale_t, shift_t, bits, group_size, ks_local, interpret)
        if j_ax is not None:
            out = jax.lax.psum(out, j_ax)
        return out

    return mesh, lower_fn, out_sharding, arg_shardings


def _infer_sharding(bits, group_size, k_shards, interpret, mesh, arg_shapes, shape):
    x_s, p_s, _, _ = [a.sharding for a in arg_shapes]
    return NamedSharding(mesh, P(_spec2(x_s)[0], _spec2(p_s)[0]))


def _propagate_user(bits, group_size, k_shards, interpret, mesh, user_shape):
    return user_shape.sharding


_qbits_mm_p.def_partition(
    partition=_partition,
    infer_sharding_from_operands=_infer_sharding,
    propagate_user_sharding=_propagate_user,
    # Shardy factor rule: m/n pass through; k (x contraction), j (packed
    # columns) and g (scale-group rows) are reduction factors — they never
    # propagate to the output, and shardings on them imply partial products.
    sharding_rule="m k, n j, g n, g n -> m n",
    reduction_factors=("k", "j", "g"),
)


def qbits_mm_partitioned(
    x,
    packed,
    scale_t,
    shift_t,
    bits,
    group_size,
    *,
    k_shards: int = 1,
    interpret: bool = False,
):
    """Partitioner-aware y[..., N] = x[..., K] @ dequant(packed).T.

    Unlike `qbits_matmul_kernel_call` this never returns None: outside the
    kernel envelope each device falls back to a local XLA dequant-matmul,
    preserving the sharding semantics. Returns float32 (callers apply
    activation scales and cast).
    """
    N = packed.shape[0]
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = 1
    for d in lead:
        M *= d
    out = _qbits_mm_p(
        x.reshape(M, K), packed,
        scale_t.astype(jnp.float32), shift_t.astype(jnp.float32),
        bits, group_size, k_shards, interpret,
    )
    return out.reshape(*lead, N)
