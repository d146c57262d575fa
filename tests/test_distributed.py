"""True multi-process data-parallel test (SURVEY.md §2.4, BASELINE config 5).

The in-process mesh tests (tests/test_parallel.py) validate the GSPMD
shardings on 8 virtual devices; this test validates the *multi-host
runtime glue* — ``initialize_distributed`` + cross-process collectives —
by spawning 2 real processes (2 virtual CPU devices each, gloo backend)
that run one sharded ``train_chunk`` over the global 4-device mesh, and
asserting the result matches a single-process run on an identical mesh.
On a TPU pod the same code path rides ICI instead of gloo.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_dp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",          # keep the axon relay out
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": REPO,
    })
    return env


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    out_npz = tmp_path / "mp_params.npz"
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out_npz)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    assert out_npz.exists(), "\n".join(logs)
    got = np.load(out_npz)

    # Single-process reference on an identical 4-device mesh (the pytest
    # session has 8 virtual devices; use the first 4).
    import jax

    from tests.mp_dp_worker import run_step
    from tpu_se.parallel import make_mesh

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    ref = run_step(mesh)
    for i, layer in enumerate(ref.params):
        np.testing.assert_allclose(got[f"w{i}"], np.asarray(layer["w"]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got[f"b{i}"], np.asarray(layer["b"]),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got["alpha"], np.asarray(ref.alpha),
                               rtol=1e-6, atol=1e-7)
