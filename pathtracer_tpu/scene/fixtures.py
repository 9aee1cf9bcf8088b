"""Scene fixture resolution: the repo is self-contained.

`scenes/` at the repo root carries the six scene descriptions (regenerated
from the reference's formats, reference scenes/*.json), the teapot / cow /
alien meshes, and the reference golden render — so every test, bench, and
demo runs WITHOUT the read-only reference mount. When the mount IS present
it is accepted as an alternate source (useful for diffing against upstream).
"""
from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REPO_SCENES = os.path.join(REPO_ROOT, "scenes")
REFERENCE_SCENES = "/root/reference/scenes"


def scene_path(name: str) -> str:
    """Resolve a scene JSON (e.g. "cornell" or "cornell.json") to a path.

    Prefers the repo's own scenes/; falls back to the reference mount.
    """
    if not name.endswith(".json"):
        name += ".json"
    for base in (REPO_SCENES, REFERENCE_SCENES):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"scene '{name}' not found in {REPO_SCENES} or {REFERENCE_SCENES}")


def model_path(name: str) -> str:
    """Resolve a mesh file (e.g. "teapot.obj") the same way."""
    for base in (REPO_SCENES, REFERENCE_SCENES):
        p = os.path.join(base, "models", name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"model '{name}' not found")


def golden_path() -> str:
    """The reference Cornell 5000-spp golden render (PNG)."""
    for p in (os.path.join(REPO_SCENES, "golden",
                           "REFERENCE_cornell.5000samp.png"),
              "/root/reference/img/reference/REFERENCE_cornell.5000samp.png"):
        if os.path.exists(p):
            return p
    raise FileNotFoundError("golden render not found")
