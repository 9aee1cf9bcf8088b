#!/usr/bin/env python
"""Worker process for the multi-host render test / demo.

Usage (one invocation per process):
  python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> \
      <scene.json> <out.npy> [res] [spp]

Each process wires into the job via jax.distributed.initialize, renders the
scene over the GLOBAL mesh (all processes' devices), and every process
writes the assembled image (they are identical by construction) to
<out.npy>.<proc_id>.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, n_procs, pid, scene_path, out = sys.argv[1:6]
    res = int(sys.argv[6]) if len(sys.argv) > 6 else 64
    spp = int(sys.argv[7]) if len(sys.argv) > 7 else 8

    # CPU multi-process: each process exposes 4 virtual devices -> the
    # global mesh has 4 * num_processes chips.
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    # must run before ANY backend-touching call — including package imports
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(n_procs),
                               process_id=int(pid))

    import numpy as np

    from pathtracer_tpu import load_scene
    from pathtracer_tpu.parallel.distributed import render_distributed

    assert jax.process_count() == int(n_procs)
    scene, settings = load_scene(scene_path, overrides={
        "RES": [res, res], "DEPTH": 4, "ITERATIONS": spp})
    img = render_distributed(scene, settings, iterations=spp)
    np.save(f"{out}.{pid}", np.asarray(img))
    print(f"proc {pid}/{n_procs}: wrote {out}.{pid}.npy "
          f"(devices={jax.device_count()} local={jax.local_device_count()})")


if __name__ == "__main__":
    main()
