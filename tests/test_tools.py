"""Smoke tests for the tools (perfstats timing harness)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.utils.profiling import measure_stages, ray_survival_report


@pytest.mark.slow
def test_perfstats_smoke(cornell_small):
    scene, settings = cornell_small
    report = ray_survival_report(scene, settings, iteration=2)
    assert "Initial rays: 4096" in report
    stats = measure_stages(scene, settings)
    table = stats.table()
    assert "Intersection" in table and "FUSED frame" in table
    assert stats.frame_ms > 0 and np.isfinite(stats.frame_ms)
