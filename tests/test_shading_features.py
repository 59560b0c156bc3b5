"""Smooth vertex-normal shading and area-light soft shadows —
production features beyond the reference (which shades flat facets
with a single point light)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.models import meshes as mesh_gen
from ray_tracer_tpu.ops.shade import light_sample_offsets, vertex_normals
from ray_tracer_tpu.render.renderer import prepare, render


def _with(cfg, **render_kw):
    return dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, **render_kw)
    )


def test_vertex_normals_flat_grid():
    """Every area-weighted vertex normal of a flat plane grid is the
    (shared) facet normal direction, for both conventions."""
    plane = mesh_gen.make_plane(extent=2.0, y=0.0, density=2)
    for serial in (False, True):
        vn = np.asarray(vertex_normals(
            jnp.asarray(plane.verts), jnp.asarray(plane.faces), serial=serial
        ))
        n = vn / np.linalg.norm(vn, axis=1, keepdims=True)
        assert np.allclose(np.abs(n[:, 1]), 1.0, atol=1e-6)
        # one consistent hemisphere across all vertices
        assert (np.sign(n[:, 1]) == np.sign(n[0, 1])).all()


def test_vertex_normals_sphere_radial():
    """On a uv-sphere the area-weighted vertex normal is radial to a few
    degrees (pole fans and quad diagonals bias it slightly)."""
    sph = mesh_gen.make_uv_sphere(center=(0.0, 0.0, 0.0), radius=1.0,
                                  n_lat=16, n_lon=24)
    vn = np.asarray(vertex_normals(
        jnp.asarray(sph.verts), jnp.asarray(sph.faces), serial=False
    ))
    n = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    radial = sph.verts / np.linalg.norm(sph.verts, axis=1, keepdims=True)
    c = np.abs(np.sum(n * radial, axis=1))
    assert c.min() > 0.97, f"min |cos| {c.min()}"


def test_smooth_normals_render_paths_agree(tiny_prep):
    """Smooth shading changes the image (curved spheres) and is
    consistent between the CSR walk and the packed production path."""
    a = np.asarray(render(prepare(tiny_prep.cfg, scene=tiny_prep.scene)))
    cfg_s = _with(tiny_prep.cfg, normal_mode="smooth")
    b = np.asarray(render(prepare(cfg_s, scene=tiny_prep.scene)))
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)
    cfg_p = _with(tiny_prep.cfg, normal_mode="smooth", traversal="packed")
    c = np.asarray(render(prepare(cfg_p, scene=tiny_prep.scene)))
    np.testing.assert_allclose(b, c, rtol=1e-4, atol=5e-2)


def test_smooth_normals_reject_faithful(tiny_prep):
    cfg = _with(tiny_prep.cfg, normal_mode="smooth", faithful=True,
                shading="serial")
    with pytest.raises(ValueError, match="faithful"):
        render(prepare(cfg, scene=tiny_prep.scene))


def test_smooth_vertex_gradient_fd():
    """FD == autodiff through the interpolated-normal path: moving a
    vertex changes the vertex-normal table, the interpolated shading
    normal and the shading itself (one-triangle scene: no topology
    change possible)."""
    import jax

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes
    from ray_tracer_tpu.opt.fit import image_loss, split_scene

    tri = MeshArrays(
        verts=np.array([[-2, -0.5, -2], [2, -0.5, -2], [0, -0.5, 3]],
                       np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((1, 3), np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 100.0, 50.0), kd=2.0, ks=3.0,
                         spec_alpha=4.0, ka=0.2)
    light = LightConfig(position=(1.0, 4.0, 1.0), intensity=1.0)
    scene = scene_from_meshes([(tri, 0)], [mat], light)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0, 2.5, 0.5), target=(0, -1, 0),
                            up=(0, 0, 1), fov_degrees=60.0, width=8, height=8),
        light=light,
        render=RenderConfig(shading="parallel", faithful=False,
                            normal_mode="smooth", max_bounces=0,
                            shadow_eps=1e-3, shadow_scale=0.5, ray_tile=64),
    )
    prep = prepare(cfg, scene=scene)
    target = jnp.zeros((8, 8, 3), jnp.float32)

    def f(params):
        return image_loss(params, prep.scene, prep.grid.arrays,
                          prep.grid.meta, prep.cfg, target)

    params = split_scene(prep.scene)
    val = params.verts
    tangent = np.zeros(val.shape, np.float64)
    tangent[2, 1] = 1.0
    tangent = jnp.asarray(tangent, val.dtype)
    g = jax.grad(f)(params)
    analytic = float(jnp.sum(g.verts * tangent))
    eps = 1e-3
    fd = (float(f(params._replace(verts=val + eps * tangent)))
          - float(f(params._replace(verts=val - eps * tangent)))) / (2 * eps)
    assert np.isfinite(analytic)
    np.testing.assert_allclose(analytic, fd, rtol=2e-2, atol=1e-7)


def test_light_sample_offsets():
    offs = light_sample_offsets(16, 0.5)
    assert offs.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(offs, axis=1), 0.5, rtol=1e-5)
    # spread over the sphere, not clustered: the mean is near the center
    assert np.linalg.norm(offs.mean(axis=0)) < 0.1
    np.testing.assert_array_equal(offs, light_sample_offsets(16, 0.5))


def test_soft_shadows_penumbra(tiny_prep):
    """An area light produces a penumbra: some pixels end strictly
    between their hard-shadowed and unshadowed values."""
    hard = np.asarray(render(prepare(tiny_prep.cfg, scene=tiny_prep.scene)))
    cfg_soft = _with(tiny_prep.cfg, light_radius=0.8, shadow_samples=8)
    soft = np.asarray(render(prepare(cfg_soft, scene=tiny_prep.scene)))
    lit = np.asarray(render(prepare(
        _with(tiny_prep.cfg, shadow_scale=1.0), scene=tiny_prep.scene
    )))
    assert np.isfinite(soft).all()
    assert not np.array_equal(hard, soft)
    strictly_between = (soft > hard + 1e-4) & (soft < lit - 1e-4)
    assert strictly_between.any(), "no penumbra pixels found"
    # deterministic (fixed sample pattern, no RNG)
    again = np.asarray(render(prepare(cfg_soft, scene=tiny_prep.scene)))
    np.testing.assert_array_equal(soft, again)


def test_soft_shadows_packed_persistent(tiny_prep):
    """The sampled shadow path runs under the persistent wave too and
    stays close to the CSR result."""
    cfg_a = _with(tiny_prep.cfg, light_radius=0.8, shadow_samples=4)
    cfg_b = _with(tiny_prep.cfg, light_radius=0.8, shadow_samples=4,
                  traversal="packed", scheduler="persistent", wave=256)
    a = np.asarray(render(prepare(cfg_a, scene=tiny_prep.scene)))
    b = np.asarray(render(prepare(cfg_b, scene=tiny_prep.scene)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-2)


def test_point_light_defaults_unchanged(tiny_prep):
    """shadow_samples=1 / light_radius=0 is the exact pre-feature path:
    radius alone (without samples) must not change the image."""
    base = np.asarray(render(prepare(tiny_prep.cfg, scene=tiny_prep.scene)))
    cfg_r = _with(tiny_prep.cfg, light_radius=0.8)  # samples stays 1
    r = np.asarray(render(prepare(cfg_r, scene=tiny_prep.scene)))
    np.testing.assert_array_equal(base, r)


def test_light_on_surface_terminates():
    """A light placed exactly ON a visible surface makes that hit's
    shadow ray zero-direction; _slab_entry must reject it (the lane
    would otherwise spin to the iteration bound and, under the
    persistent wave, never flush its primary record)."""
    import jax.numpy as jnp

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes

    # camera looks straight down at a big floor triangle; light sits ON
    # the triangle so the pixel under it has to_light == 0
    tri = MeshArrays(
        verts=np.array([[-8, 0, -8], [8, 0, -8], [0, 0, 8]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((1, 3), np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 100.0, 50.0), kd=2.0, ks=1.0,
                         spec_alpha=4.0, ka=0.2)
    light = LightConfig(position=(0.0, 0.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(tri, 0)], [mat], light)
    for scheduler in ("tiled", "persistent"):
        cfg = SceneConfig(
            materials=(mat,),
            camera=CameraConfig(position=(0, 4, 0), target=(0, 0, 0),
                                up=(0, 0, 1), fov_degrees=60.0,
                                width=5, height=5),
            light=light,
            render=RenderConfig(shading="parallel", faithful=False,
                                traversal="packed", scheduler=scheduler,
                                wave=32, ray_tile=32, shadow_eps=1e-3),
        )
        prep = prepare(cfg, scene=scene)
        img = np.asarray(render(prep))
        assert np.isfinite(img).all(), scheduler
        # the floor is visible (hits recorded, lanes flushed)
        assert (img > 0).any(), scheduler


def test_slab_entry_rejects_degenerate_rays():
    import jax.numpy as jnp

    from ray_tracer_tpu.ops.traverse_packed import _slab_entry

    class G:
        lower = jnp.zeros((3,), jnp.float32)
        upper = jnp.ones((3,), jnp.float32)

    o = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [np.nan, 0.5, 0.5],
                     [0.5, 0.5, 0.5]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 0.0],      # zero direction
                     [1.0, 0.0, 0.0],      # fine
                     [1.0, 0.0, 0.0],      # NaN origin
                     [np.nan, 1.0, 0.0]],  # NaN direction
                    jnp.float32)
    mint = jnp.zeros((4,), jnp.float32)
    maxt = jnp.full((4,), jnp.inf, jnp.float32)
    _, entered = _slab_entry(G, o, d, mint, maxt)
    np.testing.assert_array_equal(np.asarray(entered),
                                  [False, True, False, False])


def test_smooth_normals_with_bounces():
    """Reflection directions follow the smooth normal: a reflective
    sphere scene renders finite with bounces + smooth normals across
    schedulers, and differs from face-normal bounces."""
    import dataclasses

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.models.materials import MaterialTable

    scene, cfg = gradcheck_scene(16, 16)
    mats = (dataclasses.replace(cfg.materials[0], reflective=True, km=0.5),
            cfg.materials[1])
    scene = scene._replace(materials=MaterialTable.from_configs(mats))
    base = dataclasses.replace(cfg, materials=mats)

    def img(**kw):
        c = dataclasses.replace(
            base, render=dataclasses.replace(base.render, ray_tile=64,
                                             max_bounces=2, **kw)
        )
        return np.asarray(render(prepare(c, scene=scene)))

    face = img()
    smooth = img(normal_mode="smooth")
    assert np.isfinite(smooth).all()
    assert not np.array_equal(face, smooth)
    pers = img(normal_mode="smooth", traversal="packed",
               scheduler="persistent", wave=256)
    np.testing.assert_allclose(smooth, pers, rtol=1e-4, atol=5e-2)
