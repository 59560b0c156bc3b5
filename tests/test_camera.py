"""Camera ray generation vs the reference formula (Serial/raytracer.cpp:124-161)."""

import math

import numpy as np

from ray_tracer_tpu.config import CameraConfig
from ray_tracer_tpu.ops.camera import camera_rays


def _reference_dir(cfg, x, y):
    """Scalar port of the reference's per-pixel math."""
    pos = np.asarray(cfg.position, np.float64)
    target = np.asarray(cfg.target, np.float64)
    up = np.asarray(cfg.up, np.float64)
    up = up / np.linalg.norm(up)
    w = -(target - pos)
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    v = v / np.linalg.norm(v)
    fd = 1.0 / (2.0 * math.tan(cfg.fov_degrees * math.pi / 360.0))
    ar = cfg.width / cfg.height
    xw = ar * (x - cfg.width / 2.0 + 0.5) / cfg.width
    yw = (y - cfg.height / 2.0 + 0.5) / cfg.height
    d = -w * fd + u * xw + v * yw
    return d / np.linalg.norm(d)


def test_ray_dirs_match_reference_formula():
    cfg = CameraConfig(position=(3, 5, 3), up=(0, -1, 0), fov_degrees=45.0, width=16, height=8)
    rays = camera_rays(cfg)
    dirs = np.asarray(rays.dirn).reshape(8, 16, 3)
    for (x, y) in [(0, 0), (15, 0), (0, 7), (8, 3), (15, 7)]:
        np.testing.assert_allclose(
            dirs[y, x], _reference_dir(cfg, x, y), rtol=2e-6, atol=2e-6
        )


def test_flat_index_is_y_major():
    """Pixel (x, y) -> flat index y*W + x (the reference framebuffer layout)."""
    cfg = CameraConfig(width=4, height=3)
    rays = camera_rays(cfg)
    dirs = np.asarray(rays.dirn)
    assert dirs.shape == (12, 3)
    grid = dirs.reshape(3, 4, 3)
    np.testing.assert_array_equal(dirs[1 * 4 + 2], grid[1, 2])


def test_origins_are_camera_position():
    cfg = CameraConfig(position=(1.0, 2.0, 3.0), width=4, height=4)
    rays = camera_rays(cfg)
    np.testing.assert_array_equal(
        np.asarray(rays.orig), np.tile([1.0, 2.0, 3.0], (16, 1))
    )


def test_camera_ray_at_bitwise_matches_camera_rays_odd_spp():
    """camera_ray_at's documented bitwise contract, at the spp values
    where an on-device (s+0.5)/spp divide drifts by 1 ulp (non-power-
    of-two): offsets must come from the same Python-float constants."""
    import jax.numpy as jnp
    import numpy as np

    from ray_tracer_tpu.config import CameraConfig
    from ray_tracer_tpu.ops.camera import camera_ray_at, camera_rays

    cfg = CameraConfig(position=(3.0, 5.0, 3.0), target=(0, 0, 0),
                       up=(0, -1, 0), fov_degrees=45.0, width=8, height=8)
    for spp in (1, 2, 3, 5):
        batch = camera_rays(cfg, spp=spp)
        at = camera_ray_at(
            cfg, jnp.arange(8 * 8 * spp * spp, dtype=jnp.int32), spp=spp
        )
        np.testing.assert_array_equal(
            np.asarray(batch.dirn), np.asarray(at.dirn), err_msg=f"spp={spp}"
        )
