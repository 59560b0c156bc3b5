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


def test_depth_of_field_rays_converge_at_focal_plane():
    """Thin lens: all of a pixel's subsample rays pass through the same
    point on the focal plane (that is what keeps in-focus geometry
    sharp), and their origins sit on the aperture disk."""
    import dataclasses

    from ray_tracer_tpu.config import CameraConfig
    from ray_tracer_tpu.ops.camera import camera_basis, camera_rays

    cfg = CameraConfig(position=(0.0, 0.0, 5.0), target=(0, 0, 0),
                       up=(0, 1, 0), fov_degrees=45.0, width=4, height=4,
                       aperture=0.25, focus_distance=5.0)
    spp = 3
    rays = camera_rays(cfg, spp=spp)
    hw = 16
    pos, u, v, w, _ = camera_basis(cfg)
    pos, w = np.asarray(pos), np.asarray(w)
    o = np.asarray(rays.orig)
    d = np.asarray(rays.dirn)
    # origins: on the aperture disk, not all at the camera position
    r = np.linalg.norm(o - pos, axis=1)
    assert r.max() <= cfg.aperture + 1e-6
    assert r.max() > 0.05
    # every lens ray passes through ITS subsample's pinhole focal point
    # (each subsample also jitters the subpixel offset, so different
    # subsamples aim at slightly different focal-plane points)
    pin = camera_rays(
        dataclasses.replace(cfg, aperture=0.0), spp=spp
    )
    po = np.asarray(pin.orig)
    pd = np.asarray(pin.dirn)
    for i in (0, 5, 15, 2 * hw + 7, 8 * hw + 11):
        tp = cfg.focus_distance / np.dot(pd[i], -w)
        target_pt = po[i] + tp * pd[i]
        t = (cfg.focus_distance - np.dot(o[i] - pos, -w)) / np.dot(d[i], -w)
        np.testing.assert_allclose(o[i] + t * d[i], target_pt, atol=2e-6)


def test_depth_of_field_pinhole_unchanged():
    """aperture=0 (and aperture>0 at spp=1) is the bitwise pinhole."""
    from ray_tracer_tpu.config import CameraConfig
    from ray_tracer_tpu.ops.camera import camera_rays

    base = CameraConfig(width=6, height=6)
    dof = CameraConfig(width=6, height=6, aperture=0.5)
    a = camera_rays(base, spp=1)
    b = camera_rays(dof, spp=1)
    np.testing.assert_array_equal(np.asarray(a.dirn), np.asarray(b.dirn))
    np.testing.assert_array_equal(np.asarray(a.orig), np.asarray(b.orig))


def test_depth_of_field_ray_at_bitwise():
    """camera_ray_at keeps its bitwise contract under the lens."""
    import jax.numpy as jnp

    from ray_tracer_tpu.config import CameraConfig
    from ray_tracer_tpu.ops.camera import camera_ray_at, camera_rays

    cfg = CameraConfig(position=(3.0, 5.0, 3.0), target=(0, 0, 0),
                       up=(0, -1, 0), fov_degrees=45.0, width=8, height=8,
                       aperture=0.2)
    for spp in (2, 3):
        batch = camera_rays(cfg, spp=spp)
        at = camera_ray_at(
            cfg, jnp.arange(8 * 8 * spp * spp, dtype=jnp.int32), spp=spp
        )
        np.testing.assert_array_equal(
            np.asarray(batch.dirn), np.asarray(at.dirn), err_msg=f"spp={spp}"
        )
        np.testing.assert_array_equal(
            np.asarray(batch.orig), np.asarray(at.orig), err_msg=f"spp={spp}"
        )


def test_depth_of_field_render():
    """End-to-end: a defocused render differs from the focused one and
    stays finite; focus at the scene keeps the in-focus render close to
    the pinhole spp render."""
    import dataclasses

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.render.renderer import prepare, render

    scene, cfg = gradcheck_scene(16, 16)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64, spp=2)
    )
    pin = np.asarray(render(prepare(cfg, scene=scene)))
    cfg_f = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, aperture=0.02)
    )
    focused = np.asarray(render(prepare(cfg_f, scene=scene)))
    cfg_b = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, aperture=1.0,
                                        focus_distance=40.0)
    )
    blurred = np.asarray(render(prepare(cfg_b, scene=scene)))
    assert np.isfinite(focused).all() and np.isfinite(blurred).all()
    # tiny aperture focused at the subject ~ pinhole; big defocus is not
    d_f = np.abs(focused - pin).mean()
    d_b = np.abs(blurred - pin).mean()
    assert d_b > 5 * max(d_f, 1e-3), (d_f, d_b)
