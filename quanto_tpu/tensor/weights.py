"""Quantized weights.

Functional analogues of the reference weight tensors:
- `WeightQBytesArray` ≈ `WeightQBytesTensor` (`tensor/weights/qbytes.py:31-326`):
  8-bit (int8/fp8) symmetric, per-tensor or per-axis.
- `WeightQBitsArray` ≈ `WeightQBitsTensor` (`tensor/weights/qbits.py:34-317`):
  int2/int4 affine with scale+shift, optionally group-wise, payload bit-packed.

The reference selects kernel-specific subclasses (AWQ / TinyGemm / Marlin) in
`create()` and converts back to the generic layout before serialization.
The TPU analogue of those optimized layouts lives in `quanto_tpu.ops.pallas`
(MXU-tile-native packing); the *serialized* layout here stays kernel-agnostic
and bit-compatible with quanto checkpoints.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.quantize import (
    dequantize_affine,
    dequantize_symmetric,
    quantize_affine,
    quantize_symmetric,
)
from .grouped import grouped_shape, ungroup
from .packed import PackedArray
from .qarray import QArray, register_qarray
from .qtype import qtype


__all__ = [
    "WeightQBytesArray",
    "WeightQBitsArray",
    "WeightQBitsTpuArray",
    "quantize_weight",
    "fake_quantize_weight",
]


@register_qarray
class WeightQBytesArray(QArray):
    """8-bit symmetric weights: int8 or fp8 `_data` with per-tensor/per-axis `_scale`."""

    _data: jnp.ndarray
    _scale: jnp.ndarray
    qtype: qtype
    axis: Optional[int]
    float_dtype: jnp.dtype
    activation_qtype: Optional[qtype]

    @classmethod
    def quantize(
        cls,
        base: jnp.ndarray,
        qt: qtype,
        axis: Optional[int],
        scale: jnp.ndarray,
        activation_qtype: Optional[qtype] = None,
    ) -> "WeightQBytesArray":
        data = quantize_symmetric(base, qt, axis, scale)
        return cls(
            _data=data,
            _scale=jnp.asarray(scale),
            qtype=qt,
            axis=axis,
            float_dtype=jnp.dtype(base.dtype),
            activation_qtype=activation_qtype,
        )

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._data.shape)

    @property
    def dtype(self):
        return self.float_dtype

    @property
    def data(self) -> jnp.ndarray:
        return self._data

    @property
    def scale(self) -> jnp.ndarray:
        return self._scale

    def dequantize(self) -> jnp.ndarray:
        return dequantize_symmetric(self._data, self._scale, self.float_dtype)

    def transpose(self) -> "WeightQBytesArray":
        """2D transpose, flipping the quantization axis (reference `qbytes.py:294-320`)."""
        if self.ndim != 2:
            raise ValueError("transpose is only supported for 2D weights")
        new_axis = None if self.axis is None else (0 if self.axis == -1 else -1)
        scale = self._scale
        if self.axis is not None:
            scale = scale.T
        return WeightQBytesArray(
            _data=self._data.T,
            _scale=scale,
            qtype=self.qtype,
            axis=new_axis,
            float_dtype=self.float_dtype,
            activation_qtype=self.activation_qtype,
        )


@register_qarray
class WeightQBitsArray(QArray):
    """Sub-byte (int2/int4) affine weights.

    `_data` is a `PackedArray` of unsigned codes in grouped layout, `_scale`
    and `_shift` broadcast against the grouped shape. A float `_shift` is a
    pre-scale offset; an integer `_shift` is a zero-point (reference
    `tensor/qbits.py:27-68`).
    """

    _data: PackedArray
    _scale: jnp.ndarray
    _shift: jnp.ndarray
    qtype: qtype
    axis: int
    group_size: Optional[int]
    orig_shape: Tuple[int, ...]
    float_dtype: jnp.dtype

    @classmethod
    def quantize(
        cls,
        base: jnp.ndarray,
        qt: qtype,
        axis: int,
        group_size: Optional[int],
        scale: jnp.ndarray,
        shift: jnp.ndarray,
    ) -> "WeightQBitsArray":
        data = quantize_affine(base, qt.bits, axis, group_size, scale, shift)
        packed = PackedArray.pack(data, qt.bits)
        return cls(
            _data=packed,
            _scale=jnp.asarray(scale),
            _shift=jnp.asarray(shift),
            qtype=qt,
            axis=axis,
            group_size=group_size,
            orig_shape=tuple(base.shape),
            float_dtype=jnp.dtype(base.dtype),
        )

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.orig_shape

    @property
    def dtype(self):
        return self.float_dtype

    @property
    def data(self) -> PackedArray:
        return self._data

    @property
    def scale(self) -> jnp.ndarray:
        return self._scale

    @property
    def shift(self) -> jnp.ndarray:
        return self._shift

    def dequantize(self) -> jnp.ndarray:
        codes = self._data.unpack()
        grouped = dequantize_affine(codes, self._scale, self._shift, jnp.float32)
        return ungroup(grouped, self.axis, self.orig_shape).astype(self.float_dtype)

    def optimize(self) -> "QArray":
        """Repack into the TPU kernel layout when eligible.

        The analogue of the reference's kernel-specific subclass selection
        (`tensor/weights/qbits.py:94-138` create()) and post-deserialization
        `optimize()` (`weights/qbits.py:201-221`): the optimized layout lives
        only in device memory; serialization converts back to this generic
        grouped layout.
        """
        converted = WeightQBitsTpuArray.from_generic(self)
        return converted if converted is not None else self


@register_qarray
class WeightQBitsTpuArray(QArray):
    """Sub-byte weights in the TPU fused-kernel layout.

    `_packed` is word-packed along K (see `ops/pallas/qbits_mm.py`): the w16
    layout ([out, in*bits/16] int16, 4 codes/word — the default for int4,
    ~3% faster decode) or the uint8 split-half baseline ([out, in*bits/8]);
    the payload dtype selects the kernel's unpack arithmetic.
    `_scale_t`/`_shift_t` are TRANSPOSED [groups, out] float32 with
    float-shift semantics (`deq = scale * code - shift`) — transposed so the
    kernel slices per-group [1, out] rows that broadcast over its output
    tile directly.

    `k_shards` > 1 selects the block-local variant of the same layout: K is
    split into `k_shards` contiguous blocks, each packed independently, so
    packed COLUMNS shard along a mesh axis at block boundaries (row-parallel
    tensor parallelism) with scale/shift ROWS sharding congruently — each
    device owns whole scale groups of its own K blocks. `repack()` converts
    between k_shards values (scale/shift values are unchanged).
    """

    _packed: jnp.ndarray
    _scale_t: jnp.ndarray
    _shift_t: jnp.ndarray
    qtype: qtype
    group_size: Optional[int]
    orig_shape: Tuple[int, ...]
    float_dtype: jnp.dtype
    k_shards: int = 1
    # Off-envelope dims (N % 128, K alignment, or group_size % 128 — e.g.
    # GPT-OSS's hidden 2880 with its auto group size 96): the PACKED layout
    # is zero-padded to (Npad, Kpad) with each gs-code group padded to
    # gs_pad codes, while scale/shift VALUES and the serialized generic
    # layout are bit-identical to the unpadded grid. Exact because padded x
    # columns are zero (`pad_activations`) and padded output rows are
    # sliced away (`slice_out`). None = no padding (aligned dims).
    pad: Optional[Tuple[int, int, Optional[int]]] = None  # (Npad, Kpad, gs_pad)

    @staticmethod
    def eligible(
        orig_shape: Tuple[int, ...],
        bits: int,
        group_size: Optional[int],
        k_shards: int = 1,
    ) -> bool:
        """Kernel-layout constraints (mirrors `ops/pallas/qbits_mm.py` gating),
        applied per K block for the block-local (`k_shards` > 1) layout."""
        if len(orig_shape) != 2 or bits not in (2, 4):
            return False
        N, K = orig_shape
        vals = 8 // bits
        gs = group_size if group_size is not None else K
        if K % k_shards != 0 or (K // vals) % k_shards != 0:
            return False
        kp_b = K // vals // k_shards  # u8-layout packed columns per K block
        if N % 128 != 0 or kp_b % 128 != 0:
            return False
        if gs == K:
            return k_shards == 1  # one group cannot straddle K blocks
        return gs % 128 == 0 and kp_b % gs == 0

    @staticmethod
    def pad_geometry(
        orig_shape: Tuple[int, ...],
        bits: int,
        group_size: Optional[int],
    ) -> Optional[Tuple[int, int, Optional[int]]]:
        """Smallest zero-padded geometry (Npad, Kpad, gs_pad) that puts an
        off-envelope [N, K] / group_size weight onto the kernel envelope
        (`eligible`); None when no padding helps (or none is needed)."""
        if len(orig_shape) != 2 or bits not in (2, 4):
            return None
        N, K = orig_shape
        vals = 8 // bits
        npad = -128 * (-N // 128)
        if group_size is None:
            # Per-tensor: tail-pad K so packed columns tile in 128-lanes.
            align = vals * 128
            kpad = -align * (-K // align)
            geom = (npad, kpad, None)
        else:
            gs = group_size
            if K % gs != 0:
                return None
            gs_pad = -128 * (-gs // 128)  # ceil to the 128-lane multiple
            g = K // gs
            # Tail-align so packed columns tile AND whole groups fit:
            # eligible() needs (Kpad/vals) % 128 == 0 and (Kpad/vals) %
            # gs_pad == 0; gs_pad is a 128-multiple by construction, so
            # vals * gs_pad covers both.
            align = vals * gs_pad
            kpad = -align * (-(g * gs_pad) // align)
            geom = (npad, kpad, gs_pad)
        if (geom[0], geom[1]) == (N, K) and geom[2] in (group_size, None):
            return None  # nothing to pad
        gs_k = geom[2] if geom[2] is not None else None
        if not WeightQBitsTpuArray.eligible((geom[0], geom[1]), bits, gs_k, 1):
            return None
        return geom

    @classmethod
    def from_generic(
        cls, w: "WeightQBitsArray", k_shards: int = 1
    ) -> Optional["WeightQBitsTpuArray"]:
        from ..ops.pallas.qbits_mm import pack_for_kernel

        if w.axis != 0:
            return None
        pad = None
        if not cls.eligible(w.orig_shape, w.qtype.bits, w.group_size, k_shards):
            if k_shards != 1:
                return None
            pad = cls.pad_geometry(w.orig_shape, w.qtype.bits, w.group_size)
            if pad is None:
                return None
        N, K = w.orig_shape
        gs = w.group_size if w.group_size is not None else K
        codes = ungroup(w._data.unpack(), w.axis, w.orig_shape)
        G = K // gs
        scale = jnp.asarray(w._scale, jnp.float32).reshape(N, G)
        shift = jnp.asarray(w._shift)
        if jnp.issubdtype(shift.dtype, jnp.floating):
            shift = shift.astype(jnp.float32).reshape(N, G)
        else:
            # Integer zero-point: deq = scale*(code - zp) = scale*code - scale*zp.
            shift = scale * shift.astype(jnp.float32).reshape(N, G)
        if pad is not None:
            npad, kpad, gs_pad = pad
            if gs_pad is None:  # per-tensor: plain tail pad
                codes = jnp.pad(codes, ((0, npad - N), (0, kpad - K)))
            else:
                # Pad each gs-code group to gs_pad codes, then tail groups.
                codes = codes.reshape(N, G, gs)
                codes = jnp.pad(codes, ((0, npad - N), (0, 0), (0, gs_pad - gs)))
                codes = codes.reshape(npad, G * gs_pad)
                if kpad > G * gs_pad:
                    codes = jnp.pad(codes, ((0, 0), (0, kpad - G * gs_pad)))
                gp = kpad // gs_pad
                scale = jnp.pad(scale, ((0, npad - N), (0, gp - G)))
                shift = jnp.pad(shift, ((0, npad - N), (0, gp - G)))
            if gs_pad is None and npad > N:
                scale = jnp.pad(scale, ((0, npad - N), (0, 0)))
                shift = jnp.pad(shift, ((0, npad - N), (0, 0)))
        return cls(
            _packed=pack_for_kernel(codes, w.qtype.bits, k_shards),
            _scale_t=scale.T,
            _shift_t=shift.T,
            qtype=w.qtype,
            group_size=w.group_size,
            orig_shape=tuple(w.orig_shape),
            float_dtype=w.float_dtype,
            k_shards=k_shards,
            pad=pad,
        )

    @property
    def kernel_group_size(self) -> Optional[int]:
        """Group size of the PACKED layout (gs_pad on padded arrays) — what
        kernel calls must receive; serialization keeps `group_size`."""
        if self.pad is not None and self.pad[2] is not None:
            return self.pad[2]
        return self.group_size

    def pad_activations(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad the contraction dim of `x` to match a padded packed
        layout (per-group gs -> gs_pad interleaved padding + tail). The
        padded columns multiply zero, so the matmul is exact."""
        if self.pad is None:
            return x
        N, K = self.orig_shape
        npad, kpad, gs_pad = self.pad
        lead = [(0, 0)] * (x.ndim - 1)
        if gs_pad is None or self.group_size is None:
            return jnp.pad(x, lead + [(0, kpad - K)])
        gs = self.group_size
        g = K // gs
        xs = x.reshape(x.shape[:-1] + (g, gs))
        xs = jnp.pad(xs, lead + [(0, 0), (0, gs_pad - gs)])
        xs = xs.reshape(x.shape[:-1] + (g * gs_pad,))
        if kpad > g * gs_pad:
            xs = jnp.pad(xs, lead + [(0, kpad - g * gs_pad)])
        return xs

    def slice_out(self, out: jnp.ndarray) -> jnp.ndarray:
        """Drop padded output rows ([..., Npad] -> [..., N])."""
        if self.pad is None or self.pad[0] == self.orig_shape[0]:
            return out
        return out[..., : self.orig_shape[0]]

    def _true_codes(self):
        """(codes [N, K], scale [N, G], shift [N, G]) on the TRUE grid,
        un-padding the packed layout when needed."""
        from ..ops.pallas.qbits_mm import unpack_split_half

        N, K = self.orig_shape
        if self.pad is None:
            codes = unpack_split_half(self._packed, self.qtype.bits, K, self.k_shards)
            return codes, self._scale_t.T, self._shift_t.T
        npad, kpad, gs_pad = self.pad
        codes = unpack_split_half(self._packed, self.qtype.bits, kpad, self.k_shards)
        if gs_pad is None or self.group_size is None:
            codes = codes[:N, :K]
            return codes, self._scale_t.T[:N], self._shift_t.T[:N]
        gs = self.group_size
        g = K // gs
        gp = kpad // gs_pad
        codes = codes[:N].reshape(N, gp, gs_pad)[:, :g, :gs].reshape(N, K)
        return codes, self._scale_t.T[:N, :g], self._shift_t.T[:N, :g]

    def repack(self, k_shards: int) -> Optional["WeightQBitsTpuArray"]:
        """Re-pack the payload with a different K-block count (scale/shift
        arrays are reused unchanged — only the payload layout moves)."""
        from ..ops.pallas.qbits_mm import pack_for_kernel, unpack_split_half

        if k_shards == self.k_shards:
            return self
        if self.pad is not None:
            return None  # padded layouts stay single-block (TP via to_generic)
        if not self.eligible(self.orig_shape, self.qtype.bits, self.group_size, k_shards):
            return None
        N, K = self.orig_shape
        codes = unpack_split_half(self._packed, self.qtype.bits, K, self.k_shards)
        return WeightQBitsTpuArray(
            _packed=pack_for_kernel(codes, self.qtype.bits, k_shards),
            _scale_t=self._scale_t,
            _shift_t=self._shift_t,
            qtype=self.qtype,
            group_size=self.group_size,
            orig_shape=self.orig_shape,
            float_dtype=self.float_dtype,
            k_shards=k_shards,
        )

    @classmethod
    def from_serialized_host(
        cls,
        packed_np,
        scale_np,
        shift_np,
        qt: qtype,
        group_size: Optional[int],
        orig_shape: Tuple[int, ...],
        float_dtype,
    ) -> Optional["WeightQBitsTpuArray"]:
        """Build directly from host (numpy) serialized tensors via the native
        single-pass repack (`native/quanto_native.cpp:qt_repack_grouped_to_
        splithalf`) — one C++ pass + one device_put instead of shipping the
        grouped payload to the device and round-tripping unpack/ungroup/
        repack ops through the TPU tunnel. Returns None when the native
        library is unavailable or the shape is outside the kernel envelope
        (caller falls back to `optimize()`)."""
        import numpy as np

        from .. import native

        if not cls.eligible(tuple(orig_shape), qt.bits, group_size):
            return None
        N, K = orig_shape
        gs = group_size if group_size is not None else K
        packed = native.repack_grouped_to_splithalf(
            np.asarray(packed_np), N, K, gs, qt.bits
        )
        if packed is None:
            return None
        if qt.bits == 4 and (K // 4) % 128 == 0:
            # Host-side u8 split-half -> w16 (the kernel's preferred layout,
            # see `ops/pallas/qbits_mm.py:pack_for_kernel`): u8 byte j holds
            # positions (j, j+K/2); w16 word j holds positions j + p*K/4.
            lo = (packed & 0xF).astype(np.uint16)   # positions 0..K/2-1
            hi = (packed >> 4).astype(np.uint16)    # positions K/2..K-1
            Q = K // 4
            packed = (
                lo[:, :Q] | (lo[:, Q:] << 4) | (hi[:, :Q] << 8) | (hi[:, Q:] << 12)
            ).view(np.int16)
        G = K // gs
        scale = np.asarray(scale_np, np.float32).reshape(N, G)
        shift = np.asarray(shift_np)
        if np.issubdtype(shift.dtype, np.floating):
            shift = shift.astype(np.float32).reshape(N, G)
        else:
            shift = scale * shift.astype(np.float32).reshape(N, G)
        return cls(
            _packed=jnp.asarray(packed),
            _scale_t=jnp.asarray(scale.T),
            _shift_t=jnp.asarray(shift.T),
            qtype=qt,
            group_size=group_size,
            orig_shape=tuple(orig_shape),
            float_dtype=jnp.dtype(float_dtype),
        )

    def to_generic(self) -> "WeightQBitsArray":
        """Back to the kernel-agnostic serialized layout
        (rule from reference `weights/qbits.py:223-235`); padded layouts
        un-pad to the original grid — serialization is pad-free."""
        from .grouped import group

        N, K = self.orig_shape
        gs = self.group_size
        codes, scale_ng, shift_ng = self._true_codes()
        if gs is not None:
            codes = group(codes, 0, gs)
            scale = scale_ng.reshape(-1, 1).astype(self.float_dtype)
            shift = shift_ng.reshape(-1, 1).astype(self.float_dtype)
        else:
            scale = scale_ng.astype(self.float_dtype)
            shift = shift_ng.astype(self.float_dtype)
        packed = PackedArray.pack(codes, self.qtype.bits)
        return WeightQBitsArray(
            _data=packed,
            _scale=scale,
            _shift=shift,
            qtype=self.qtype,
            axis=0,
            group_size=gs,
            orig_shape=self.orig_shape,
            float_dtype=self.float_dtype,
        )

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.orig_shape

    @property
    def dtype(self):
        return self.float_dtype

    def dequantize(self) -> jnp.ndarray:
        N, K = self.orig_shape
        gs = self.group_size if self.group_size is not None else K
        codes, scale_ng, shift_ng = self._true_codes()
        scale = jnp.repeat(scale_ng, gs, axis=1)
        shift = jnp.repeat(shift_ng, gs, axis=1)
        return (codes.astype(jnp.float32) * scale - shift).astype(self.float_dtype)


def quantize_weight(
    t: jnp.ndarray,
    qt: qtype,
    axis: Optional[int],
    scale: jnp.ndarray,
    shift: Optional[jnp.ndarray] = None,
    group_size: Optional[int] = None,
    activation_qtype: Optional[qtype] = None,
):
    """Quantize a weight array (always per-axis or grouped).

    Front-door mirroring the reference (`tensor/weights/quantization.py:27-73`):
    8-bit qtypes forbid shift/group_size and collapse a size-1 axis to
    per-tensor; sub-byte qtypes require a shift.
    """
    if axis not in (0, -1):
        raise ValueError("axis parameter must be 0 (first axis) or -1 (last axis)")
    if qt.bits == 8:
        if shift is not None:
            raise ValueError("shift cannot be specified for 8-bit qtypes")
        if group_size is not None:
            raise ValueError("group_size cannot be specified for 8-bit qtypes.")
        if axis is not None and t.shape[axis] == 1:
            axis = None
        return WeightQBytesArray.quantize(t, qt, axis, scale, activation_qtype)
    if shift is None:
        raise ValueError("shift must be specified for qtypes lower than 8-bit")
    return WeightQBitsArray.quantize(t, qt, axis, group_size, scale, shift)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 5))
def fake_quantize_weight(
    t: jnp.ndarray,
    qt: qtype,
    axis: Optional[int],
    scale: jnp.ndarray,
    shift: Optional[jnp.ndarray],
    group_size: Optional[int],
) -> jnp.ndarray:
    """Quantize-dequantize round trip with straight-through gradients.

    This is the QAT path: the reference achieves the same effect with
    identity-backward autograd Functions on its quantizers
    (`weights/qbytes.py:62-65`, `weights/qbits.py:59-62`). Gradients flow
    unchanged to `t`; scale and shift receive none.
    """
    qw = quantize_weight(t, qt, axis, scale, shift=shift, group_size=group_size)
    return qw.dequantize().astype(t.dtype)


def _fake_qw_fwd(t, qt, axis, scale, shift, group_size):
    out = fake_quantize_weight(t, qt, axis, scale, shift, group_size)
    return out, (jnp.asarray(scale), None if shift is None else jnp.asarray(shift))


def _fake_qw_bwd(qt, axis, group_size, res, g):
    scale, shift = res
    return (g, jnp.zeros_like(scale), None if shift is None else jnp.zeros_like(shift))


fake_quantize_weight.defvjp(_fake_qw_fwd, _fake_qw_bwd)


def weight_qbits_grouped_meta(shape: Tuple[int, ...], axis: int, group_size: Optional[int]):
    """Shapes of the grouped codes/scale for a logical weight `shape`.

    Used by deserialization to rebuild `WeightQBitsArray` from flat tensors
    (reference `weights/qbits.py:166-199`).
    """
    if group_size is not None:
        gshape = grouped_shape(shape, axis, group_size)
    else:
        gshape = tuple(shape)
    return gshape
