"""Golden-image parity vs the reference's checked-in CUDA render.

The reference repository ships img/reference/REFERENCE_cornell.5000samp.png
(800x800, 5000 spp; copied to scenes/golden/). The FULL-SCALE comparison is
a committed artifact: PARITY.md, produced by tools/golden_parity.py on TPU
at 800x800/2000 spp — 8x8-block MAD 0.0018 (max 0.17 on the noisy
light-edge blocks), 16x16-block MAD 0.0011, correlation 0.986, per-channel
mean deltas 0.0003. With depth_quirk=True we reproduce the CURRENT
reference code's behavior instead, which is ~23% brighter than its own
golden image (the PNG predates the quirk — see ops/bsdf.py shade).

This test renders small (CPU-friendly) and compares block means with
tolerances derived from that measured envelope, scaled for this config's
resolution/spp (96 spp at 64x64 carries ~4.5x the per-block noise of the
2000-spp artifact).
"""
import os

import numpy as np
import pytest

from pathtracer_tpu import load_scene
from pathtracer_tpu.engine.wavefront import render
from pathtracer_tpu.io.image import load_png

from pathtracer_tpu.scene.fixtures import golden_path, scene_path

GOLDEN = golden_path()


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden unavailable")
def test_cornell_matches_reference_render():
    ref = load_png(GOLDEN)
    assert ref.shape == (800, 800, 3)

    scene, settings = load_scene(scene_path("cornell"),
                                 overrides={"RES": [64, 64], "DEPTH": 8})
    img = np.asarray(render(scene, settings, iterations=96, chunk=32))
    img = np.clip(img, 0.0, 1.0)[:, ::-1, :]  # saveImage mirror (main.cpp:407)

    rb = ref.reshape(8, 100, 8, 100, 3).mean(axis=(1, 3))
    ob = img.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))

    # envelope: full-scale artifact measured 16x16-block MAD 0.0011 at
    # 2000 spp (PARITY.md); this config's blocks carry ~5x that noise
    # (measured 0.0107 at this seed; deterministic) — 0.013 bounds it with
    # ~20% headroom while still catching any brightness/material regression
    assert abs(rb.mean() - ob.mean()) < 0.008         # global brightness
    assert np.abs(rb - ob).mean() < 0.013             # block error
    corr = np.corrcoef(rb.ravel(), ob.ravel())[0, 1]
    # measured 0.9856 at this config/seed (matches the full-scale artifact's
    # 0.986 pixel correlation)
    assert corr > 0.98                                # structure

    # orientation: red wall left, green wall right (in the mirrored frame)
    left = img[24:40, 4:12]
    right = img[24:40, 52:60]
    assert left[..., 0].mean() > left[..., 1].mean()    # red dominant
    assert right[..., 1].mean() > right[..., 0].mean()  # green dominant
