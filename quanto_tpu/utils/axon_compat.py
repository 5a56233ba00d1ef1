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

import inspect
import os

_APPLIED = False


def _sub_byte_bits(layout) -> int:
    bits = getattr(layout, "_sub_byte_element_size_in_bits", None)
    if bits is None:
        # Private attr renamed/removed: return a sentinel that can never be
        # mistaken for a real sub-byte width, so the {0, 4} guard below
        # rejects the relaxation instead of silently accepting everything.
        return -1
    return bits


def _axon_runtime_active() -> bool:
    """True only when the axon PJRT plugin is the live TPU backend.

    The shim works around an axon-specific metadata bug (sub-byte layouts
    reported with element size 0); on healthy runtimes (CPU, standard
    libtpu) monkeypatching jax internals is all risk and no benefit, so we
    refuse to install there. QUANTO_TPU_AXON_SHIM=1/0 force-overrides.
    """
    env = os.environ.get("QUANTO_TPU_AXON_SHIM")
    if env is not None:
        return env.lower() in ("1", "true", "yes", "on")
    try:
        from jax._src import xla_bridge as xb

        return "axon" in xb.backends()
    except Exception:
        return False


def apply() -> None:
    """Install the shard-arg layout shim (idempotent, axon-only).

    No-op unless the axon runtime is detected (see _axon_runtime_active) and
    the patched handler's signature matches what the wrapper expects — both
    checks fail open to the stock handler, per ADVICE round-3 (medium).
    """
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True
    if not _axon_runtime_active():
        return
    from jax._src import array as _array
    from jax._src.interpreters import pxla

    orig = pxla.shard_arg_handlers[_array.ArrayImpl]
    try:
        params = list(inspect.signature(orig).parameters)
    except (TypeError, ValueError):
        return
    if params != ["xs", "shardings", "layouts", "copy_semantics"]:
        return  # jax changed the handler ABI: leave it untouched

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
