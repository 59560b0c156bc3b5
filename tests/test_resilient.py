"""Banded rendering with retry: identical image, failures recovered."""

import numpy as np
import pytest

from ray_tracer_tpu.render.renderer import render
from ray_tracer_tpu.render.resilient import render_banded


def test_banded_equals_single_shot(tiny_prep):
    single = np.asarray(render(tiny_prep))
    banded = render_banded(tiny_prep, bands=4)
    # bands are separately-compiled programs: same math, fusion may differ
    np.testing.assert_allclose(single, banded, rtol=1e-5, atol=1e-3)
    # re-running the banded render is bit-stable
    np.testing.assert_array_equal(banded, render_banded(tiny_prep, bands=4))


def test_transient_failures_are_retried(tiny_prep):
    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.render.renderer import render_rays_tiled
    import jax

    calls = {"n": 0}

    def flaky(band_rays):
        calls["n"] += 1
        if calls["n"] in (1, 3):  # first attempt of two bands fails
            raise RuntimeError("transient relay error")
        colors = render_rays_tiled(
            band_rays, tiny_prep.scene, tiny_prep.grid.arrays,
            tiny_prep.grid.meta, tiny_prep.cfg.render,
        )
        return np.asarray(jax.device_get(colors))

    img = render_banded(tiny_prep, bands=4, retries=2, backoff_s=0.0, band_fn=flaky)
    np.testing.assert_allclose(
        np.asarray(render(tiny_prep)), img, rtol=1e-5, atol=1e-3
    )
    assert calls["n"] == 6  # 4 bands + 2 retries


def test_exhausted_retries_raise(tiny_prep):
    def always_fail(_):
        raise RuntimeError("permanent failure")

    with pytest.raises(RuntimeError, match="permanent"):
        render_banded(tiny_prep, bands=2, retries=1, backoff_s=0.0,
                      band_fn=always_fail)
