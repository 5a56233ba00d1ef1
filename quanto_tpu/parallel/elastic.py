"""Failure detection and checkpoint-based elastic recovery.

The torch reference has no robustness surface at all (SURVEY.md §5.3); the
multi-host serving/training north star needs one. TPU failure semantics
shape the design: a dead host does not error its peers — it HANGS their
collectives — so detection is (a) local progress watchdogs and (b) timed
cross-host barrier probes, and recovery is process restart + reload from
the latest atomic checkpoint (the standard TPU-pod pattern: the scheduler
re-execs the job; elasticity means losing at most `interval` steps, not
reconfiguring the mesh live).

Components:
- `ElasticCheckpointer`: periodic atomic checkpoints (write-to-tmp + rename)
  of a quantized NNX model + a small JSON state (step, rng, engine cursor),
  with `latest()` discovery and `restore()` via the quantized state_dict
  (repack-on-load kernel layouts included). Multi-host: only process 0
  writes; all processes restore the same bytes.
- `Watchdog`: a progress watchdog thread — `beat()` every step; if no beat
  arrives within `timeout`, runs `on_stall` (default: log + SIGABRT so the
  supervisor restarts this host rather than hanging the whole slice).
- `barrier_probe`: a timed all-process barrier; False = some peer is
  unreachable (run it from a health loop or before checkpointing).
- `supervise`: in-process supervision loop for a step function — on
  failure, restores the latest checkpoint and resumes, up to max_failures.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import sys
import tempfile
import threading
import time
from typing import Callable, Dict, Optional

import jax


__all__ = ["ElasticCheckpointer", "Watchdog", "barrier_probe", "supervise"]


def _log(msg: str) -> None:
    print(f"[quanto_tpu.elastic] {msg}", file=sys.stderr, flush=True)


class ElasticCheckpointer:
    """Periodic atomic checkpoints of a quantized model + user state.

    Layout: `<root>/step_<N>/` containing `model.safetensors` (the
    kernel-agnostic quantized state dict, `serialization.state_dict`) and
    `state.json` (step + any JSON-serializable user payload). A checkpoint
    directory appears atomically (tmp dir + rename), so a crash mid-write
    never corrupts `latest()`. Old checkpoints beyond `keep` are pruned.
    """

    def __init__(self, root: str, interval_steps: int = 100, keep: int = 2):
        self.root = root
        self.interval = max(int(interval_steps), 1)
        self.keep = max(int(keep), 1)
        self._primary = jax.process_index() == 0
        if self._primary:
            os.makedirs(root, exist_ok=True)

    # -- discovery ------------------------------------------------------

    def _steps(self):
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("step_"):
                try:
                    out.append(int(name.split("_", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def latest(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def path(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step}")

    # -- save -----------------------------------------------------------

    def maybe_save(self, step: int, model, extra: Optional[Dict] = None) -> bool:
        if step % self.interval != 0:
            return False
        self.save(step, model, extra)
        return True

    @staticmethod
    def _fully_addressable(model) -> bool:
        from .. import serialization

        for arr in serialization.state_dict(model).values():
            if hasattr(arr, "is_fully_addressable") and not arr.is_fully_addressable:
                return False
        return True

    def save(self, step: int, model, extra: Optional[Dict] = None) -> None:
        """Write the step checkpoint.

        Collectivity contract (ADVICE round-3): when the model holds
        cross-host-sharded (non-fully-addressable) arrays, save() is a
        COLLECTIVE — every process must call it, or the slice hangs in the
        orbax barrier. When all arrays are fully addressable, save() is
        process-local (non-primary hosts return immediately), so
        primary-only step gating is safe in that regime.
        """
        final = self.path(step)
        if self._fully_addressable(model):
            if os.path.exists(final):
                return
        else:
            # Cross-host-sharded weights: serializing through numpy would
            # fail (no process can see every shard). Route through orbax,
            # which writes each process's shards collectively and commits
            # atomically; every process must participate. All processes
            # must also AGREE on whether step_<N> already exists: on shared
            # storage a fast host can observe the rename before a slow one,
            # and a split decision around the collective save would hang the
            # slice (some hosts inside, others returned). Process 0's view
            # is canonical. The broadcast lives only on this branch so the
            # fully-addressable path above stays non-collective.
            exists = os.path.exists(final)
            if jax.process_count() > 1:
                import numpy as np
                from jax.experimental import multihost_utils

                exists = bool(
                    multihost_utils.broadcast_one_to_all(np.asarray(exists))
                )
            if exists:
                return
            self._save_orbax(step, model, extra, final)
            return
        if not self._primary:
            return  # non-primary hosts rely on process-0's checkpoint
        from .. import serialization

        tmp = tempfile.mkdtemp(prefix=f".step_{step}_", dir=self.root)
        try:
            serialization.save_file(model, os.path.join(tmp, "model.safetensors"))
            with open(os.path.join(tmp, "state.json"), "w") as f:
                json.dump({"step": step, "extra": extra or {}}, f)
            os.rename(tmp, final)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._prune()

    def _prune(self):
        for old in self._steps()[: -self.keep]:
            shutil.rmtree(self.path(old), ignore_errors=True)

    def _save_orbax(self, step, model, extra, final):
        # Same atomicity contract as the safetensors path: assemble the
        # step directory under a hidden name, rename into place only once
        # complete — a crash mid-save never leaves a step_<N>/ that
        # latest() would select but restore() cannot read. All processes
        # participate in the collective orbax save (it blocks until every
        # host commits); only process 0 writes state.json and renames.
        import orbax.checkpoint as ocp

        from .. import serialization

        sd = serialization.state_dict(model)
        tmp = os.path.join(self.root, f".orbax_step_{step}")
        # Only process 0 clears a stale tmp dir, and every process barriers
        # before the collective save starts — an unsynchronized rmtree on
        # shared storage could delete a peer's in-flight checkpoint writes.
        if self._primary:
            shutil.rmtree(tmp, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"quanto_tpu_ckpt_clear_{step}")
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            ckptr.save(os.path.abspath(os.path.join(tmp, "orbax")), dict(sd))
        if self._primary:
            with open(os.path.join(tmp, "state.json"), "w") as f:
                json.dump({"step": step, "extra": extra or {}, "format": "orbax"}, f)
            os.rename(tmp, final)
            self._prune()

    # -- restore --------------------------------------------------------

    def restore(self, model, step: Optional[int] = None) -> Dict:
        """Load the checkpoint into `model` (in place, quantized layouts
        repacked on load). Returns the saved state dict
        {"step": int, "extra": {...}}."""
        from .. import serialization

        if step is None:
            step = self.latest()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        d = self.path(step)
        with open(os.path.join(d, "state.json")) as f:
            state = json.load(f)
        if state.get("format") == "orbax":
            import jax
            import orbax.checkpoint as ocp

            # Restore each tensor straight onto the live model's current
            # sharding (abstract target from the model's own state dict) —
            # a replicated numpy restore would both destroy the TP layout
            # and OOM on exactly the cross-host-sharded models this path
            # exists for.
            target = {
                k: jax.ShapeDtypeStruct(
                    v.shape, v.dtype, sharding=getattr(v, "sharding", None)
                )
                for k, v in serialization.state_dict(model).items()
            }
            with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
                sd = ckptr.restore(os.path.abspath(os.path.join(d, "orbax")), target)
            serialization.load_state_dict(model, sd)
        else:
            serialization.load_file(model, os.path.join(d, "model.safetensors"))
        return state


class Watchdog:
    """Progress watchdog: call `beat()` every step; if no beat lands within
    `timeout_s`, `on_stall` runs once (default: log and abort the process so
    the job scheduler restarts this host — a hung host stalls every peer's
    collectives, so dying loudly IS the recovery action on TPU pods)."""

    def __init__(
        self,
        timeout_s: float,
        on_stall: Optional[Callable[[], None]] = None,
        poll_s: Optional[float] = None,
    ):
        self.timeout = float(timeout_s)
        self.on_stall = on_stall or self._default_stall
        self._poll = poll_s if poll_s is not None else min(1.0, self.timeout / 4)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self.stalled = False
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _default_stall():
        _log("no progress within watchdog timeout; aborting for restart")
        os.kill(os.getpid(), signal.SIGABRT)

    def _run(self):
        while not self._stop.wait(self._poll):
            if time.monotonic() - self._last > self.timeout:
                self.stalled = True
                try:
                    self.on_stall()
                finally:
                    return

    def beat(self):
        self._last = time.monotonic()

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=self._poll * 2 + 1)
        return False


def barrier_probe(timeout_s: float = 60.0) -> bool:
    """Timed all-process liveness probe. True = every process reached the
    barrier within the timeout; False = a peer is unreachable (its host is
    down or hung). The barrier runs in a guarded thread so the CALLER is
    never wedged by a dead peer.

    A False result means "restart this job", not "carry on": the probe
    thread stays parked inside the barrier (there is no way to cancel a
    collective), so after a timeout this process's collective ordering can
    no longer be trusted — treat the process as unhealthy and exit for the
    scheduler to restart, the same action `Watchdog` takes on a stall."""
    if jax.process_count() == 1:
        return True

    result = {"ok": False}

    def probe():
        try:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("quanto_tpu_barrier_probe")
            result["ok"] = True
        except Exception as e:  # noqa: BLE001 - any failure means unhealthy
            _log(f"barrier probe failed: {type(e).__name__}: {e}")

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    return result["ok"]


def supervise(
    step_fn: Callable[[int], None],
    model,
    checkpointer: ElasticCheckpointer,
    *,
    start_step: int = 0,
    num_steps: int,
    max_failures: int = 3,
    extra_state: Optional[Dict] = None,
    on_restore: Optional[Callable[[Dict], None]] = None,
) -> int:
    """Run `step_fn(step)` for `num_steps`, checkpointing through
    `checkpointer` and recovering from failures by restoring the latest
    checkpoint (at most `max_failures` times). Returns the final step.

    This is the in-process half of elasticity (transient errors,
    preemptions surfaced as exceptions); hard host failures go through
    `Watchdog`'s abort-for-restart path and re-enter here via
    `checkpointer.latest()` on the next exec.
    """
    if jax.process_count() > 1:
        # In-process retry is unsound under SPMD: one host rewinding its
        # step counter while peers continue desynchronizes every subsequent
        # collective. Multi-host recovery is restart-the-job + resume from
        # `checkpointer.latest()` at startup (which this loop does); only
        # single-process runs may self-heal in place.
        max_failures = 0

    def _restore_latest():
        # Walk newest -> oldest (skipping unreadable checkpoints, e.g. a
        # partially-written one from a pre-atomicity version), never past
        # start_step: older checkpoints belong to an excluded phase.
        for resume in reversed(checkpointer._steps()):
            if resume < start_step:
                return None
            try:
                state = checkpointer.restore(model, resume)
            except (FileNotFoundError, json.JSONDecodeError):
                _log(f"checkpoint step {resume} unreadable; trying older")
                continue
            if on_restore is not None:
                on_restore(state)
            return state
        return None

    step = start_step
    state = _restore_latest()
    if state is not None:
        step = state["step"] + 1
        _log(f"resumed from checkpoint step {state['step']}")
    failures = 0
    while step < num_steps:
        try:
            step_fn(step)
            checkpointer.maybe_save(step, model, extra_state)
            step += 1
        except Exception as e:  # noqa: BLE001
            failures += 1
            _log(f"step {step} failed ({type(e).__name__}: {e}); failure {failures}/{max_failures}")
            if failures > max_failures:
                raise
            state = _restore_latest()
            if state is not None:
                step = state["step"] + 1
    return step
