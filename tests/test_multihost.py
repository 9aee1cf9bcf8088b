"""Multi-host execution: REAL multi-process render over a global mesh.

Spawns 2 OS processes (tools/multihost_worker.py), each with 4 virtual CPU
devices, wired by jax.distributed into one 8-chip global mesh; both render
the same Cornell config and must produce (a) identical images to each other
and (b) the same image as a single-process sharded render — the RNG is keyed
on global pixel ids, so the distribution of work over hosts is invisible
(SURVEY.md §2.6 comm backend; parallel/distributed.py).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES, SPP = 48, 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path, cornell_path):
    coord = f"localhost:{_free_port()}"
    out = str(tmp_path / "mh")
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools",
                                          "multihost_worker.py"),
             coord, "2", str(pid), cornell_path, out, str(RES), str(SPP)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-2000:]}"

    img0 = np.load(f"{out}.0.npy")
    img1 = np.load(f"{out}.1.npy")
    np.testing.assert_array_equal(img0, img1)

    # single-process sharded reference (8 virtual devices, same pool split)
    from pathtracer_tpu import load_scene
    from pathtracer_tpu.parallel.sharding import make_ray_mesh, render_sharded

    scene, settings = load_scene(cornell_path, overrides={
        "RES": [RES, RES], "DEPTH": 4, "ITERATIONS": SPP})
    ref = np.asarray(render_sharded(scene, settings, make_ray_mesh(8),
                                    iterations=SPP))
    np.testing.assert_allclose(img0, ref, atol=1e-5)
