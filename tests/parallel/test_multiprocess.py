"""True multi-process distributed tests (VERDICT r2 #2).

Each test launches 2 real OS processes with `jax.distributed.initialize` on
localhost CPU (4 virtual devices per process -> 8 global devices), so the
multi-host claims of parallel/ and elastic/ are exercised with genuine
process boundaries instead of the single-process 8-device simulation the
rest of tests/parallel uses:

- DCN(dp) x ICI(tp)-shaped global mesh creation + a sharded quantized forward
  whose result agrees across processes,
- the orbax cross-host-sharded collective checkpoint save/restore path
  (including the all-processes-agree exists check and rmtree barrier),
- `barrier_probe` returning True with live peers and False with a dead one.
"""

import os
import socket
import subprocess
import sys

import pytest


_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NPROCS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(scenario, tmp_path, timeout=240):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Workers must not inherit a TPU reservation or a stale coordinator.
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, scenario, str(port), str(i), str(_NPROCS), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(_NPROCS)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out}"
    payloads = []
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith(f"RESULT {scenario} ")]
        assert lines, f"worker {i} printed no RESULT:\n{out}"
        payloads.append(lines[-1].split(" ", 2)[2])
    return payloads


@pytest.mark.parametrize("scenario", ["decode", "orbax", "barrier", "serving"])
def test_multiprocess(scenario, tmp_path):
    payloads = _launch(scenario, tmp_path)
    assert len(set(payloads)) == 1, f"processes disagree: {payloads}"
