"""Activation-scale calibration.

NNX analogue of the reference `Calibration` TorchFunctionMode
(`optimum/quanto/calibrate.py:64-189`) and `absmax_scale` helper
(`calibrate.py:37-61`). The reference intercepts every torch function via
global hooks; in the functional NNX design, quantized modules call back into
the active `Calibration` object from their `__call__` when their
`calibrating` flag is set, and the EMA scale updates mutate NNX variables.

Calibration runs eagerly (un-jitted): the per-batch absmax reductions are
tiny compared to the forward pass and the scales must persist between
batches.

Streamline: the reference tracks — via runtime interception — which module
outputs are only ever consumed by quantization-incompatible functions, and
disables output quantization for those (`calibrate.py:90-105,158-164`). The
functional analogue here: during the (eager) calibration pass every module
output IS quantized and tagged with a consumption cell
(`tensor/activations.py:attach_consumption_cell`); quantization-aware
consumers (qlinear int8 path, qops shape/matmul ops, quantized-input
modules) mark `quantized_use`, while `.dequantize()` marks `dequantized`.
On exit, output quantization stays enabled only for modules whose outputs
saw at least one quantized use — the same net effect as the reference on
transformer models (most linear outputs feed adds/norms and lose their
output quantization).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .nn.qmodule import QModuleMixin
from .quantize import named_qmodules
from .tensor.optimizers import AbsmaxOptimizer
from .tensor.qarray import QArray
from .tensor.qtype import qtype, qint8


__all__ = ["absmax_scale", "Calibration", "calibrate_jit"]


def calibrate_jit(model, batches, *, momentum: float = 0.9, streamline: bool = True) -> None:
    """Calibrate with each forward jitted (large calibration sets).

    The eager `Calibration` context pays per-op tunnel round trips; here each
    batch is ONE device call: scale EMAs are traced NNX variable mutations
    (`nnx.jit` carries them), and the streamline consumption tagging happens
    at trace time, which records the same consumer graph. Debug tracing is
    eager-only.
    """
    from flax import nnx

    with Calibration(model, momentum=momentum, streamline=streamline):

        @nnx.jit
        def step(model, batch):
            model(batch)

        for batch in batches:
            step(model, batch)


def absmax_scale(base: jnp.ndarray, qt: qtype = qint8, axis: Optional[int] = None) -> jnp.ndarray:
    """Symmetric absmax scale of an array (reference `calibrate.py:37-61`)."""
    return AbsmaxOptimizer()(base, qt, axis)


def _updated_scale(scale: jnp.ndarray, new_scale: jnp.ndarray, momentum: float) -> jnp.ndarray:
    """EMA update; adopt the new scale outright while uninitialized (== 1).

    Mirrors the reference `_updated_scale` (`calibrate.py:31-34`), but as a
    traceable select instead of a host-synced branch, so whole calibration
    steps can run under `nnx.jit` (`calibrate_jit`) — one device call per
    batch instead of one sync per module per batch.
    """
    new_scale = jnp.asarray(new_scale, dtype=jnp.float32).reshape(())
    scale = jnp.asarray(scale, jnp.float32)
    return jnp.where(
        jnp.equal(scale, 1.0),
        new_scale,
        momentum * scale + new_scale * (1.0 - momentum),
    )


class Calibration:
    """Context manager calibrating the activation scales of quantized modules.

    Usage::

        with Calibration(model, momentum=0.9):
            for batch in samples:
                model(batch)
    """

    def __init__(
        self,
        model,
        *,
        momentum: float = 0.9,
        streamline: bool = True,
        debug: bool = False,
    ):
        self.model = model
        self.momentum = momentum
        self.streamline = streamline
        self.debug = debug
        # name lookup for debug traces
        self._names = {}
        # module id -> list of consumption cells of its tagged outputs
        self._output_cells = {}
        # modules whose outputs ARE consumed quantized (streamline keeps them)
        self._quantized_consumers = set()

    # --- hooks called by QModuleMixin ---------------------------------------

    def calibrate_input(self, module: QModuleMixin, x) -> None:
        """Update the module input scale from a batch
        (reference `calibrate.py:120-137`)."""
        if module.activation_qtype is None:
            return
        if isinstance(x, QArray):
            # Downstream of a quantized producer: adopt the max of both scales
            # (reference `calibrate.py:127-129`).
            new_scale = jnp.maximum(
                jnp.asarray(module.input_scale.get_value(), jnp.float32),
                jnp.asarray(x.scale, jnp.float32).reshape(()),
            )
            module.input_scale.set_value(new_scale)
            return
        batch_scale = absmax_scale(x, module.activation_qtype)
        module.input_scale.set_value(
            _updated_scale(module.input_scale.get_value(), batch_scale, self.momentum)
        )
        if self.debug:
            name = self._names.get(id(module), type(module).__name__)
            print(f"[calibrate] {name}.input_scale <- {float(module.input_scale.get_value()):.6g}")

    def calibrate_output(self, module: QModuleMixin, out) -> None:
        """Update the module output scale from a batch
        (reference `calibrate.py:139-155`)."""
        if module.activation_qtype is None:
            return
        if isinstance(out, QArray):
            out = out.dequantize()
        batch_scale = absmax_scale(out, module.activation_qtype)
        module.output_scale.set_value(
            _updated_scale(module.output_scale.get_value(), batch_scale, self.momentum)
        )
        if self.debug:
            name = self._names.get(id(module), type(module).__name__)
            print(f"[calibrate] {name}.output_scale <- {float(module.output_scale.get_value()):.6g}")

    def mark_quantized_consumer(self, module: QModuleMixin) -> None:
        """Mark a module whose output is consumed as a quantized array, so
        streamline keeps its output quantization enabled."""
        self._quantized_consumers.add(id(module))

    def tag_output(self, module: QModuleMixin, qout) -> None:
        """Attach a consumption cell to a module's quantized output
        (reference `tag_outputs`, `calibrate.py:176-189`)."""
        from .tensor.activations import attach_consumption_cell

        cell = {"dequantized": False, "quantized_use": False}
        attach_consumption_cell(qout, cell)
        self._output_cells.setdefault(id(module), []).append(cell)

    # --- context manager ------------------------------------------------------

    def __enter__(self) -> "Calibration":
        for name, m in named_qmodules(self.model):
            self._names[id(m)] = name
            m.calibrating = True
            m._calibration = self
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        for name, m in named_qmodules(self.model):
            m.calibrating = False
            m._calibration = None
            if not self.streamline or m.activation_qtype is None:
                continue
            cells = self._output_cells.get(id(m), [])
            consumed_quantized = id(m) in self._quantized_consumers or any(
                c["quantized_use"] for c in cells
            )
            if not consumed_quantized:
                # Output only ever dequantized (or unused): drop output
                # quantization (reference `calibrate.py:158-164`).
                m.quantize_outputs = False
                if self.debug:
                    print(f"[calibrate] streamline: disabled output quantization for {name}")
