"""Executed multi-process evidence for the distributed backend (r4 VERDICT
missing #4): launch TWO separate CPU processes joined by
``jax.distributed.initialize`` via ``distributed.init_distributed``
(localhost coordinator), build the cross-process ``global_mesh``, run the
row-sharded apply over a mesh spanning both processes, and check sharded
output parity against the single-process host golden.

The reference has no distributed analog (single shared-memory process,
SURVEY.md §5); this is the one genuinely new distributed capability — and
until this test it was the only subsystem whose code had never run.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_parity():
    # Bounded by communicate(timeout=280) below (pytest-timeout not in the
    # baked image).
    port = _free_port()
    nproc = 2
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # 2 virtual devices per process -> a 4-device global mesh.
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_NUM_CPU_DEVICES": "2",
        "PYTHONPATH": ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(nproc)],
            env=env,
            cwd=ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PARITY_OK p{i}" in out, f"process {i} no parity line:\n{out}"
