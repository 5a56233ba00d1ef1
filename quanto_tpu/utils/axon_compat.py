"""Workaround for an axon-backend sub-byte layout metadata bug.

The axon TPU runtime reports live s4 (int4) arrays with
`Layout.sub_byte_element_size_in_bits == 0`, while compiled executables
expect `4` for the same (otherwise identical) layout. jax's shard-arg
handler compares the two layouts for equality and, on mismatch, falls back
to `device_put` relayouting — which the axon client cannot do for s4 and
recurses until RecursionError. Net effect without this shim: an s4 array can
be created inside a jit but can never be passed INTO another jit (so an s4
KV cache could not cross decode-step boundaries).

The shim wraps the registered shard-arg handler and skips the layout check
(layout=None) for exactly this false mismatch: same major_to_minor, same
tiling, and the two sub-byte fields are {0, 4}. Everything else passes
through untouched, so healthy backends (where the runtime reports 4) never
hit the relaxed path.

Remaining (unfixable here) axon s4 limitations, both avoidable:
- host -> device transfer of s4 (`jnp.asarray(np_array, jnp.int4)`) fails:
  create on device inside a jit (e.g. `jax.jit(lambda: jnp.zeros(s, int4))`);
- device -> host fetch of s4 (`np.asarray(s4_array)`) hangs: convert to int8
  inside a jit first.
"""

from __future__ import annotations

_APPLIED = False


def _sub_byte_bits(layout) -> int:
    return getattr(layout, "_sub_byte_element_size_in_bits", 0)


def apply() -> None:
    """Install the shard-arg layout shim (idempotent)."""
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True
    from jax._src import array as _array
    from jax._src.interpreters import pxla

    orig = pxla.shard_arg_handlers[_array.ArrayImpl]

    def patched(xs, shardings, layouts, copy_semantics):
        layouts = list(layouts)
        for i, (x, lay) in enumerate(zip(xs, layouts)):
            if lay is None:
                continue
            try:
                xl = x.format.layout
            except Exception:
                continue
            if (
                xl != lay
                and getattr(xl, "major_to_minor", None) == getattr(lay, "major_to_minor", object())
                and getattr(xl, "tiling", None) == getattr(lay, "tiling", object())
                and {_sub_byte_bits(xl), _sub_byte_bits(lay)} <= {0, 4}
            ):
                layouts[i] = None
        return orig(xs, shardings, layouts, copy_semantics)

    pxla.shard_arg_handlers[_array.ArrayImpl] = patched
