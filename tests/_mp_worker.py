"""Worker for the multi-process multi-host test (launched by
test_multiprocess.py, not collected by pytest).

Each of 2 processes owns 4 virtual CPU devices (8 global). The worker:
1. bootstraps the cluster via initialize_distributed (the torchrun
   equivalent),
2. builds the global mesh and assembles the global batch from its
   HOST-LOCAL shard via global_batch_from_host_local,
3. runs one jitted data-parallel TinyRoma train step,
4. writes the resulting loss + a param fingerprint to its output file.

The parent test asserts both processes produce the identical fingerprint,
and that it equals the single-process result on the same global batch.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, pid, nproc, out_path = sys.argv[1:5]
    from roma_tpu.parallel.mesh import (
        global_batch_from_host_local,
        initialize_distributed,
        make_mesh,
    )

    idx, cnt = initialize_distributed(coord, int(nproc), int(pid))
    assert cnt == int(nproc), (idx, cnt)

    from mp_common import build_state_and_step, global_batch, fingerprint

    state, step = build_state_and_step(make_mesh())
    batch = global_batch()
    # host-local slice: this host loads ONLY its rows
    B = batch["im_A"].shape[0]
    lo, hi = idx * B // cnt, (idx + 1) * B // cnt
    local = {k: v[lo:hi] for k, v in batch.items()}
    mesh = make_mesh()
    gbatch = global_batch_from_host_local(local, mesh)
    state, metrics = step(state, gbatch)
    loss = float(metrics["total_loss"])
    fp = fingerprint(state)
    with open(out_path, "w") as f:
        f.write(f"{loss:.10f} {fp:.10f}\n")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
