"""Framework robustness: degenerate inputs a production system meets."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.accel.grid import build_grid
from ray_tracer_tpu.accel.packed import pack_grid
from ray_tracer_tpu.config import (
    CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
)
from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.io.obj import MeshArrays
from ray_tracer_tpu.models.scenes import scene_from_meshes
from ray_tracer_tpu.ops.intersect import intersect_brute
from ray_tracer_tpu.ops.traverse_packed import traverse_packed
from ray_tracer_tpu.render.renderer import prepare, render


def _one_tri_scene(verts, traversal="csr"):
    mesh = MeshArrays(
        verts=np.asarray(verts, np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((1, 3), np.int32),
    )
    mat = MaterialConfig(base_color=(100.0, 100.0, 100.0), kd=2.0, ks=1.0,
                         spec_alpha=4.0, ka=0.2)
    light = LightConfig(position=(0, 5, 0), intensity=1.0)
    scene = scene_from_meshes([(mesh, 0)], [mat], light)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0, 3, 3), target=(0, 0, 0), up=(0, 1, 0),
                            fov_degrees=45.0, width=8, height=8),
        light=light,
        render=RenderConfig(shading="parallel", faithful=False, ray_tile=64,
                            shadow_eps=1e-3, traversal=traversal),
    )
    return prepare(cfg, scene=scene)


def test_single_triangle_grid_and_render():
    prep = _one_tri_scene([[-1, 0, -1], [1, 0, -1], [0, 0, 1]])
    img = np.asarray(render(prep))
    assert np.isfinite(img).all() and img.max() > 0


def test_single_triangle_packed():
    prep = _one_tri_scene([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], traversal="packed")
    img = np.asarray(render(prep))
    assert np.isfinite(img).all() and img.max() > 0


def test_degenerate_triangle_never_hits():
    """Zero-area triangle: zero determinant -> strict test rejects."""
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[2.0, 0.0, 0.0]])  # collinear
    rays = RayBatch.make(jnp.array([[0.5, 1.0, 0.0]]), jnp.array([[0.0, -1.0, 0.0]]))
    res = intersect_brute(rays, v0, v1, v2)
    assert not bool(res.hit[0]) and not bool(res.any_pass[0])


def test_axis_parallel_rays_through_grid():
    """Rays exactly parallel to grid planes exercise the inf inv-dir
    paths in slab + DDA; results must stay finite."""
    prep = _one_tri_scene([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], traversal="packed")
    rays = RayBatch.make(
        jnp.array([[0.0, 0.5, -5.0], [0.2, -3.0, 0.0], [-5.0, 0.0, 0.2]]),
        jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
    )
    res = traverse_packed(rays, prep.packed.arrays, prep.packed.meta, t_gate=1e-4)
    t = np.asarray(res.t)
    assert np.isfinite(t[np.asarray(res.hit)]).all()


def test_flat_scene_grid_has_unit_axis():
    """A perfectly flat scene (zero extent on one axis) builds a 1-voxel
    axis with zero width (inv_width 0) without dividing by zero."""
    verts = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    grid = build_grid(verts, faces, use_native=False)
    assert grid.meta.n_voxels[1] == 1
    assert float(np.asarray(grid.arrays.inv_width)[1]) == 0.0
    packed = pack_grid(grid, verts, faces)
    assert packed.meta.n_blocks >= 1


def test_tiny_images():
    prep = _one_tri_scene([[-1, 0, -1], [1, 0, -1], [0, 0, 1]])
    cfg = dataclasses.replace(
        prep.cfg, camera=dataclasses.replace(prep.cfg.camera, width=1, height=1)
    )
    img = np.asarray(render(prepare(cfg, scene=prep.scene)))
    assert img.shape == (1, 1, 3)


def test_boundary_plane_parallel_ray_no_nan():
    """A ray whose origin lies EXACTLY on a grid boundary plane with a
    direction parallel to that axis (0 * inf = NaN in a naive slab test)
    must still march and hit (regression: such rays are real — shadow
    rays rearm from floor hits sitting on the grid's lower bound)."""
    import jax.numpy as jnp

    prep = _one_tri_scene([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], traversal="packed")
    lower = np.asarray(prep.packed.arrays.lower)
    # origin exactly on the lower-y plane (the triangle's plane), moving in +x
    o = np.array([[-2.0, float(lower[1]), -0.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = traverse_packed(
        RayBatch.make(jnp.asarray(o), jnp.asarray(d)),
        prep.packed.arrays, prep.packed.meta, t_gate=0.0,
    )
    t = float(np.asarray(res.t)[0])
    assert np.isfinite(np.asarray(res.steps)).all()
    assert not np.isnan(t)
    # in-plane ray: strict barycentric test rejects (det == 0), but the
    # march itself must complete without NaN poisoning
    # also: same origin, direction INTO the scene must hit
    d2 = np.array([[0.3, 0.0, 0.7]], np.float32)
    d2 /= np.linalg.norm(d2)
    res2 = traverse_packed(
        RayBatch.make(jnp.asarray(o), jnp.asarray(d2)),
        prep.packed.arrays, prep.packed.meta, t_gate=0.0,
    )
    assert np.isfinite(float(np.asarray(res2.t)[0])) or not bool(np.asarray(res2.hit)[0])


def test_serial_bounce_does_not_self_intersect():
    """A lone reflective quad under SERIAL shading (primary gate 0):
    the bounce ray starts ON its own triangle, the case the t > eps
    gate on bounce depths exists for (the traversals consult only
    t_gate for acceptance, so the bounce RayBatch mint=eps alone does
    not protect).  With nothing else in the scene every bounce must
    MISS: the blended color is exactly local * (1 - km)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes
    from ray_tracer_tpu.render.renderer import prepare, render

    quad = MeshArrays(
        verts=np.array(
            [[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]], np.float32
        ),
        faces=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        uvs=np.zeros((0, 2), np.float32),
        uv_faces=np.zeros((0, 3), np.int32),
    )
    # unit base color: the reflective blend multiplies by base AGAIN
    # (quirk-faithful, raytracer.cu:519-520), so base 1 makes the
    # expected image exactly local * (1 - km) when every bounce misses
    mat = MaterialConfig(base_color=(1.0, 1.0, 1.0), kd=2.0, ks=0.0,
                         spec_alpha=4.0, ka=0.3, km=0.5, reflective=True)
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(quad, 0)], [mat], light)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0,
                            width=16, height=16),
        light=light,
        render=RenderConfig(
            shading="serial", faithful=False, max_bounces=2,
            shadow_eps=1e-3, ray_tile=256,
        ),
    )
    prep = prepare(cfg, scene=scene)
    img2 = np.asarray(render(prep))

    cfg0 = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, max_bounces=0)
    )
    img0 = np.asarray(render(prepare(cfg0, scene=scene)))

    hit = (img0 != np.asarray(jnp.asarray(cfg.render.background))).any(axis=-1)
    assert hit.any()
    # every bounce misses, so the bounced contribution is the black
    # background and the image is exactly local * (1 - km); a bounce
    # self-intersection would re-add surface color and brighten it
    np.testing.assert_allclose(img2[hit], 0.5 * img0[hit], atol=1e-3)
