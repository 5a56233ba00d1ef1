"""Decode-attention dispatch shared by the model families.

Routes single-token decode steps to the fused Pallas flash-decode kernel
(`ops/pallas/flash_decode.py`) when enabled and in-envelope, returning None
otherwise so the caller falls back to its XLA einsum path. Centralizing the
gating keeps every model family (llama/mixtral/gpt2/opt) on the same rules —
the analogue of the reference's per-backend kernel gating in
`optimum/quanto/tensor/weights/qbits.py:94-138`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import config as ops_config


__all__ = ["try_flash_decode", "try_flash_prefill", "gqa_attention", "static_zero_pos"]


def static_zero_pos(pos) -> bool:
    """True when `pos` is STATICALLY known to be 0 at trace time (a Python /
    numpy integer, or None meaning no cache offset). Traced arrays return
    False even if concretely zero — the fast paths keyed on this must be
    resolvable while tracing."""
    import numpy as np

    if pos is None:
        return True
    return isinstance(pos, (int, np.integer)) and int(pos) == 0


def _slot_scale_t(s, dtype):
    """Per-slot KV-cache scale [B, S, Hkv, 1] -> [B, Hkv, 1, 1, S] broadcast
    for the grouped 5D logits/probs."""
    return jnp.transpose(s[..., 0], (0, 2, 1))[:, :, None, None, :].astype(dtype)


def gqa_attention(
    q5: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    *,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    softcap: Optional[float] = None,
    alibi: Optional[jnp.ndarray] = None,
    head_bias: Optional[jnp.ndarray] = None,
    k_shift: Optional[jnp.ndarray] = None,
    v_shift: Optional[jnp.ndarray] = None,
    sinks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Grouped-query attention WITHOUT materializing repeated KV: the
    query-head groups fold into a 5D einsum over shared kv heads (a
    jnp.repeat would gather a full q-head-sized copy of the cache every
    decode step — measured 4x the step time at batch 8 / ctx 2k).

    q5 [B, T, Hkv, G, D]; k/v [B, S, Hkv, D] (possibly int8/s4 cache
    payloads — the dequant convert fuses into the einsum operand read);
    mask [B or 1, 1, T, S] additive; per-slot cache scales factor out of the
    contractions: k_scale applies to the logits, v_scale to the
    probabilities. Transform order matches HF eager attention:
    (+alibi) -> *scale -> softcap -> (+head_bias) -> +mask.

    `alibi` is the falcon-style PRE-scale key-positional bias
    ([B, Hkv*G, S]-reshapeable); `head_bias` is a POST-scale per-head
    additive bias [B or 1, Hkv*G, T or 1, S] — bloom's alibi (HF adds it
    after the 1/sqrt(d) factor) and t5's relative position bias (which runs
    with scale=1.0) ride this. `mask` may be None (e.g. whisper/t5
    cross-attention over full encoder states).

    `sinks` [Hkv*G] are gpt-oss-style learned per-head ATTENTION SINK
    logits: an extra (valueless) softmax slot whose weight is dropped after
    normalization — implemented as a denominator term
    `exp(sink - max(max_logit, sink))`, never materializing the extra
    column (HF eager concatenates it, modeling_gpt_oss.eager_attention_forward).

    `k_shift`/`v_shift` [B, S, Hkv, 1] are the asymmetric-cache per-slot
    mean shifts (`tensor/kv_cache.parse_kv_spec` "...a" specs): dequant is
    `data*scale + shift`, and the shift terms stay RANK-1 in the
    contractions — `q . (k_int*s + m) = (q . k_int)*s + m * sum_d(q)` on
    the logits, and `sum_s p[s]*(v_int[s]*s + m[s]) = (p*s) @ v_int +
    (p . m)` broadcast over D on the output — so the payload dots stay
    integer and no dequantized cache copy is ever materialized.

    Returns [B, T, Hkv*G*D] in q5.dtype.

    Two softmax chains:
    - f32 (default): logits/probs stay f32 end-to-end, `jax.nn.softmax`.
    - bf16 (`ops/config.use_bf16_softmax()`): the [B, Hkv, G, T, S]
      intermediates round to bf16 at the QK-einsum epilogue and the whole
      elementwise chain runs at half the HBM traffic; reductions that need
      exactness stay f32 (max is exact in bf16; the normalizer accumulates
      f32) and normalization is DEFERRED past the PV einsum (divides the
      [.., D] output instead of the [.., S] probabilities — one fewer
      full-S pass, mathematically identical).
    """
    B, T, Hkv, G, D = q5.shape
    out_dtype = q5.dtype
    bf16_chain = out_dtype == jnp.bfloat16 and ops_config.use_bf16_softmax()
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q5, k, preferred_element_type=jnp.float32)
    if bf16_chain:
        logits = logits.astype(jnp.bfloat16)  # fuses into the einsum epilogue
    if k_scale is not None:
        logits = logits * _slot_scale_t(k_scale, logits.dtype)
    if k_shift is not None:
        # Rank-1 shift term: m_k[s] * sum_d q[b,q,h,g,d].
        qsum = jnp.sum(q5.astype(jnp.float32), axis=-1)  # [B, T, Hkv, G]
        qsum = jnp.transpose(qsum, (0, 2, 3, 1))[..., None]  # [B, Hkv, G, T, 1]
        if ops_config.use_asym_fused():
            # Compute in the CHAIN dtype: the product then joins the logits
            # elementwise epilogue (scale-mul / mask-add) in ONE fused pass
            # instead of materializing an f32 [.., S] side array. Exact when
            # the chain is f32; bf16-chain rounding matches the chain's own
            # regime.
            logits = logits + qsum.astype(logits.dtype) * _slot_scale_t(
                k_shift, logits.dtype
            )
        else:
            logits = logits + (qsum * _slot_scale_t(k_shift, jnp.float32)).astype(
                logits.dtype
            )
    if alibi is not None:
        logits = logits + alibi.reshape(B, Hkv, G, 1, -1).astype(logits.dtype)
    logits = logits * jnp.asarray(scale, logits.dtype)
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    if head_bias is not None:
        hb = head_bias.reshape(
            head_bias.shape[0], Hkv, G, head_bias.shape[-2], head_bias.shape[-1]
        )
        logits = logits + hb.astype(logits.dtype)
    if mask is not None:
        logits = logits + mask[:, :, None].astype(logits.dtype)
    snk = None
    if sinks is not None:
        # [Hkv*G] -> [1, Hkv, G, 1, 1] broadcast alongside the logits.
        snk = sinks.reshape(1, Hkv, G, 1, 1)
    if bf16_chain:
        m = jnp.max(logits, axis=-1, keepdims=True)
        if snk is not None:
            m = jnp.maximum(m, snk.astype(m.dtype))
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        if snk is not None:
            s = s + jnp.exp(snk.astype(jnp.float32) - m.astype(jnp.float32))
        raw_p = e
        if v_scale is not None:
            e = e * _slot_scale_t(v_scale, e.dtype)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", e, v, preferred_element_type=jnp.float32)
        if v_shift is not None:
            # Rank-1 shift term: (p . m_v) broadcast over D (normalization
            # below covers it too, since it divides the whole sum).
            if ops_config.use_asym_fused():
                # MXU matvec over the ALREADY-materialized probabilities
                # (~1/D of the AV einsum cost) instead of an f32
                # broadcast-multiply + full-S reduction side pass.
                corr = jnp.einsum(
                    "bhgqk,bkh->bqhg", raw_p, v_shift[..., 0].astype(raw_p.dtype),
                    preferred_element_type=jnp.float32,
                )  # [B, T, Hkv, G]
                out = out + corr[..., None]
            else:
                corr = jnp.sum(
                    raw_p.astype(jnp.float32) * _slot_scale_t(v_shift, jnp.float32),
                    axis=-1,
                )  # [B, Hkv, G, T]
                out = out + jnp.transpose(corr, (0, 3, 1, 2))[..., None]
        out = (out / jnp.transpose(s, (0, 3, 1, 2, 4))).astype(out_dtype)
    else:
        if snk is not None:
            m = jnp.max(logits, axis=-1, keepdims=True)
            m = jnp.maximum(m, snk.astype(m.dtype))
            e = jnp.exp(logits - m)
            den = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(
                snk.astype(logits.dtype) - m
            )
            probs = e / den
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        raw_p = probs
        if v_scale is not None:
            probs = probs * _slot_scale_t(v_scale, probs.dtype)
        probs = probs.astype(out_dtype)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
        if v_shift is not None:
            if ops_config.use_asym_fused():
                corr = jnp.einsum(
                    "bhgqk,bkh->bqhg", raw_p, v_shift[..., 0].astype(raw_p.dtype),
                    preferred_element_type=jnp.float32,
                )  # [B, T, Hkv, G]
                out = out + corr[..., None].astype(out.dtype)
            else:
                corr = jnp.sum(
                    raw_p.astype(jnp.float32) * _slot_scale_t(v_shift, jnp.float32),
                    axis=-1,
                )  # [B, Hkv, G, T]
                out = out + jnp.transpose(corr, (0, 3, 1, 2))[..., None].astype(out.dtype)
    return out.reshape(B, T, Hkv * G * D)

def try_flash_prefill(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_kv_heads: int,
    head_dim: int,
    *,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
) -> Optional[jnp.ndarray]:
    """Fused causal prefill attention over the RAW (pre-quantization) K/V.

    q [B, T, H, D]; k/v [B, T, Hkv, D], T > 1. Callers must ONLY use this
    when the step is statically causal-from-zero (`static_zero_pos`): every
    query attends exactly to keys 0..i of the same T-block, so the cache
    readback (and its quantize->dequantize error) is skipped entirely.

    Implementation: `splash`-MQA Pallas kernels (one per kv head via vmap,
    G query heads inside the kernel), which keep the [T, T] logits/softmax
    chain in VMEM tiles and skip the masked upper-triangle blocks — vs the
    einsum path's full-T^2 HBM round trip. Returns [B, T, H*D] in q.dtype,
    or None when disabled / outside the envelope (caller falls back to
    `gqa_attention`)."""
    if not ops_config.use_flash_prefill():
        return None
    B, T, H, D = q.shape
    if T < 256 or T % 128 != 0 or D % 128 != 0:
        return None
    if q.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as splash,
            splash_attention_mask as mask_lib,
        )
    except ImportError:  # pragma: no cover - jax always ships it here
        return None
    g = H // num_kv_heads
    interpret = ops_config.pallas_interpret()
    mask = mask_lib.MultiHeadMask(
        [mask_lib.CausalMask((T, T)) for _ in range(g)]
    )
    kernel = splash.make_splash_mqa_single_device(
        mask=mask,
        attn_logits_soft_cap=softcap,
        interpret=interpret,
    )
    # Fold the softmax scale into q (the kernel applies none).
    if scale is None:
        scale = head_dim**-0.5
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # [B, Hkv, G, T, D] / [B, Hkv, T, D] for the (batch, kv-head) vmaps.
    q5 = jnp.transpose(
        qs.reshape(B, T, num_kv_heads, g, D), (0, 2, 3, 1, 4)
    )
    k3 = jnp.transpose(k, (0, 2, 1, 3))
    v3 = jnp.transpose(v, (0, 2, 1, 3))
    run = jax.vmap(jax.vmap(kernel, in_axes=(0, 0, 0)), in_axes=(0, 0, 0))
    out = run(q5, k3, v3)  # [B, Hkv, G, T, D]
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, T, H * D)
    return out.astype(q.dtype)


# Bench/tuning knob: "v2" (full-row tile-aligned blocks), "v3" (multi-batch
# grid steps + online-softmax S chunks; knobs _V3_BB/_V3_SB), "v1" (round-1
# per-head-group blocks), "auto" = v3-then-v2-then-v1. Read at TRACE time
# (rebuild jitted fns to pick up changes).
_VARIANT = "auto"
_V3_BB = 4
_V3_SB = None


def try_flash_decode(
    q: jnp.ndarray,
    new_cache,
    cache_pos,
    num_kv_heads: int,
    head_dim: int,
) -> Optional[jnp.ndarray]:
    """Fused decode attention over the just-updated cache.

    q: [B, 1, H, D] post-rope queries (T == 1 decode step). Returns
    [B, 1, H*D] attention output, or None when the kernel is disabled or the
    shapes/dtypes are outside its envelope.
    """
    if not ops_config.use_flash_decode():
        return None
    from ..tensor.kv_cache import QKVCacheLayer
    from ..tensor.paged_kv import PagedKVLayer, paged_read_raw
    from .pallas.flash_decode import flash_decode_call
    from .pallas.flash_decode2 import flash_decode2_call
    from .pallas.flash_decode3 import flash_decode3_call

    B = q.shape[0]
    num_heads = q.shape[2]
    if isinstance(new_cache, QKVCacheLayer):
        kd, vd = new_cache._k_data, new_cache._v_data
        if kd.dtype == jnp.int4 or vd.dtype == jnp.int4:
            # s4 payloads (incl. mixed k8v4): outside the kernels' envelope
            # (they read the payload directly); the einsum path's fused s4
            # convert is also the measured-fastest route (46 us vs 115 int8
            # at 8B/S=8192, bench/attn_int8_logits_bench.py).
            return None
        if new_cache._k_shift is not None:
            return None  # asymmetric specs: rank-1 shift terms live in gqa_attention
        ks, vs = new_cache._k_scale, new_cache._v_scale
    elif isinstance(new_cache, PagedKVLayer):
        if jnp.int4 in (new_cache._k_pages.dtype, new_cache._v_pages.dtype):
            return None  # s4 pages (incl. mixed k8v4): einsum path (see above)
        if new_cache._k_shift is not None:
            return None  # asymmetric specs: shift terms live in gqa_attention
        # Dense gathered view; in-kernel page-table indirection is the
        # round-2 bandwidth optimization.
        kd, vd, ks, vs, _, _ = paged_read_raw(new_cache, B, new_cache._k_pages.dtype)
    else:
        (kd, vd), (ks, vs) = new_cache, (None, None)
    pos_vec = jnp.broadcast_to(jnp.asarray(cache_pos).reshape(-1), (B,))
    qg = q.reshape(B, num_kv_heads, num_heads // num_kv_heads, head_dim)
    # auto order: v3 (multi-batch grid + online softmax) first, then v2
    # (full-row tile-aligned blocks), then v1 for shapes outside their
    # envelopes (e.g. Hkv*D not lane-aligned).
    out = None
    if _VARIANT in ("auto", "v3"):
        out = flash_decode3_call(
            qg, kd, vd, ks, vs, pos_vec,
            bb=_V3_BB, sb=_V3_SB, interpret=ops_config.pallas_interpret(),
        )
    if out is None and _VARIANT in ("auto", "v2"):
        out = flash_decode2_call(
            qg, kd, vd, ks, vs, pos_vec, interpret=ops_config.pallas_interpret()
        )
    if out is None and _VARIANT in ("auto", "v1"):
        out = flash_decode_call(
            qg, kd, vd, ks, vs, pos_vec, interpret=ops_config.pallas_interpret()
        )
    if out is None:
        return None
    return out.reshape(B, 1, num_heads * head_dim)
