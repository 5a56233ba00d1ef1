"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md §2.10) — this is the TPU build's
scale-out entry point. On a multi-host TPU slice every host runs the same
program; `initialize()` wires `jax.distributed` (coordinator discovery is
automatic on TPU pods) and `global_mesh` builds a Mesh over all global
devices with DCN-friendly axis ordering (the slowest axis maps across hosts,
so TP collectives stay on ICI and only DP gradient/all-reduce traffic crosses
DCN — the standard scaling-book layout).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


__all__ = ["initialize", "global_mesh"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized). On TPU
    pods all arguments are discovered automatically.

    Must run before anything touches a JAX backend — do NOT probe
    `jax.process_count()` here: that call itself initializes the local
    backend and makes the real `jax.distributed.initialize` fail."""
    from jax._src import distributed as _distributed

    if getattr(_distributed.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator_address is not None or num_processes is not None:
        # Explicit wiring (tests, bespoke clusters): fail loudly.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # Single-process environment with nothing to discover.
        pass


def global_mesh(axes: Dict[str, int]) -> Mesh:
    """Mesh over ALL global devices with {axis: size} (last axis fastest).

    Put the model-parallel axis LAST (fastest-varying) so its groups stay
    within a host/ICI domain; the data-parallel axis first so it spans
    hosts over DCN.
    """
    devices = np.asarray(jax.devices())
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != devices.size:
        raise ValueError(f"Mesh {axes} needs {int(np.prod(sizes))} devices, got {devices.size}")
    return Mesh(devices.reshape(sizes), tuple(axes.keys()))
