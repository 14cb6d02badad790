"""True multi-process jax.distributed execution (VERDICT.md round-1 item 4).

Spawns two worker processes, each a separate JAX controller with 4 virtual
CPU devices, connected through a local coordinator — the same bring-up path
as a 2-host TPU pod.  The workers run cross-process collectives (psum over
the seq x lm pod mesh) and the landmark-sharded distributed BA over all 8
global devices, and check parity against the single-device optimizer.

The reference has no distributed capability at all (SURVEY.md section 2);
this validates the greenfield multi-host layer end-to-end rather than by
mesh-shape assertions.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

N_PROCS = 2
TIMEOUT_S = 420


def test_pod_mesh_helpers():
    """Mesh-construction helpers used by the workers (folded from the former
    test_multihost.py; the real cross-process coverage is below)."""
    import jax

    from rebvio_tpu.parallel import multihost as MH

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = MH.make_pod_mesh(seq_parallel=2, inner_axis="lm")
    assert mesh.shape == {"seq": 2, "lm": 4}
    assert MH.local_batch_slice(8, mesh) == (0, 8)  # single process owns all
    assert MH.make_pod_mesh(inner_axis="kl").shape["seq"] == 1


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the axon TPU plugin must not try to initialize in the workers
    env.pop("JAX_PLATFORM_NAME", None)

    procs = []
    outs = []
    for pid in range(N_PROCS):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, str(pid), str(N_PROCS), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(stdout)

    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["ok"] for r in results)
    # both controllers must see identical collective results
    assert results[0]["psum"] == results[1]["psum"]
    assert results[0]["hist"] == results[1]["hist"]
    assert results[0]["rel_err"] < 1e-2
