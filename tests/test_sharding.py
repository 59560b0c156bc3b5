"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY §4: 'multi-host
without a pod').  Sharded execution must equal single-device execution
bit-for-bit, and the collectives API must round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.intersect import intersect_brute
from ray_tracer_tpu.parallel import collectives as coll
from ray_tracer_tpu.parallel.mesh import factor_mesh, make_mesh
from ray_tracer_tpu.parallel.shard import (
    intersect_brute_sharded,
    render_sharded,
    stride_permutation,
)
from ray_tracer_tpu.render.renderer import render


def test_factor_mesh():
    assert factor_mesh(8) == (4, 2)
    assert factor_mesh(7) == (7, 1)
    assert factor_mesh(16) == (4, 4)


def test_stride_permutation_is_permutation():
    p = stride_permutation(10, 4)
    assert sorted(p.tolist()) == list(range(10))


def test_sharded_render_equals_single_device(tiny_prep, eight_device_mesh):
    single = np.asarray(render(tiny_prep))
    for balance in (False, True):
        sharded = np.asarray(
            render_sharded(tiny_prep, mesh=eight_device_mesh, axis="rays", balance=balance)
        )
        np.testing.assert_array_equal(single, sharded)


def test_triangle_sharded_intersect_equals_brute(tiny_prep, eight_device_mesh):
    prep = tiny_prep
    v0, v1, v2 = prep.scene.triangle_soa()
    rays = camera_rays(prep.cfg.camera)
    want = intersect_brute(rays, v0, v1, v2, t_lower=1e-4)
    got = intersect_brute_sharded(
        rays, v0, v1, v2, eight_device_mesh, rays_axis="rays", tris_axis="tris",
        t_lower=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    h = np.asarray(want.hit)
    np.testing.assert_array_equal(np.asarray(want.tri_id)[h], np.asarray(got.tri_id)[h])
    np.testing.assert_allclose(np.asarray(want.t)[h], np.asarray(got.t)[h], rtol=1e-6)


def test_sharded_train_step_matches_unsharded_loss(tiny_prep, eight_device_mesh):
    from ray_tracer_tpu.opt.fit import make_train_step, split_scene

    prep = tiny_prep
    params = split_scene(prep.scene)
    target = jnp.full((16, 16, 3), 10.0, jnp.float32)

    s_step, s_init = make_train_step(prep.grid.meta, prep.cfg, lr=1e-3,
                                     mesh=eight_device_mesh, axis="rays")
    u_step, u_init = make_train_step(prep.grid.meta, prep.cfg, lr=1e-3, mesh=None)
    _, _, s_loss = s_step(params, s_init(params), prep.scene, prep.grid.arrays, target)
    _, _, u_loss = u_step(params, u_init(params), prep.scene, prep.grid.arrays, target)
    np.testing.assert_allclose(float(s_loss), float(u_loss), rtol=1e-6)


def test_collectives_gather_scatter_roundtrip(eight_device_mesh):
    mesh = make_mesh(8, ("rays",))
    x = jnp.arange(8 * 4 * 3, dtype=jnp.float32).reshape(32, 3)

    def body(x_shard):
        full = coll.gather_image(x_shard, "rays")
        mine = coll.scatter_rays(full, "rays")
        return mine

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("rays"), out_specs=P("rays")
    ))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_collectives_ring_shift(eight_device_mesh):
    mesh = make_mesh(8, ("rays",))
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)

    def body(x_shard):
        return coll.ring_shift(x_shard, "rays", shift=1)

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("rays"), out_specs=P("rays")
    ))(x)
    np.testing.assert_array_equal(
        np.asarray(out).ravel(), np.roll(np.arange(8), 1)
    )


def test_allreduce_gradients(eight_device_mesh):
    mesh = make_mesh(8, ("rays",))
    x = jnp.ones((8, 2), jnp.float32)

    def body(x_shard):
        return coll.allreduce_gradients({"g": x_shard.sum()}, "rays")["g"]

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("rays"), out_specs=P(), check_vma=False
    ))(x)
    assert float(out) == 16.0


def test_ring_sharded_intersect_equals_brute(tiny_prep, eight_device_mesh):
    """The ring-pass (ppermute) sharded-geometry intersect must agree
    with the all-gather sharded intersect AND the single-device brute
    integrator: same nearest hit, same lowest-id tie-break, regardless
    of which shard a ray starts on."""
    from ray_tracer_tpu.ops.intersect import intersect_brute
    from ray_tracer_tpu.parallel.shard import intersect_ring_sharded

    prep = tiny_prep
    rays = camera_rays(prep.cfg.camera)
    v0, v1, v2 = prep.scene.triangle_soa()
    got = intersect_ring_sharded(
        rays, v0, v1, v2, eight_device_mesh, rays_axis="rays",
        tris_axis="tris", t_lower=0.0,
    )
    want = intersect_brute(rays, v0, v1, v2, t_lower=0.0)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_array_equal(
        np.asarray(got.tri_id)[h], np.asarray(want.tri_id)[h]
    )
    # t agrees to the last ulp only: cramer over an F/8 slice vectorizes
    # (FMA-contracts) differently than over the full soup
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(want.t)[h], rtol=1e-6
    )


def test_ring_sharded_intersect_tris_only_axis(tiny_prep):
    """Ring over a pure 8-way 'tris' mesh (no ray axis)."""
    from ray_tracer_tpu.ops.intersect import intersect_brute
    from ray_tracer_tpu.parallel.mesh import make_mesh
    from ray_tracer_tpu.parallel.shard import intersect_ring_sharded

    mesh = make_mesh(8, ("tris",), shape=(8,))
    prep = tiny_prep
    rays = camera_rays(prep.cfg.camera)
    v0, v1, v2 = prep.scene.triangle_soa()
    got = intersect_ring_sharded(
        rays, v0, v1, v2, mesh, rays_axis=None, tris_axis="tris", t_lower=0.0
    )
    want = intersect_brute(rays, v0, v1, v2, t_lower=0.0)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)  # miss-lane id conventions differ (-1 vs argmin)
    np.testing.assert_array_equal(
        np.asarray(got.tri_id)[h], np.asarray(want.tri_id)[h]
    )


def test_ring_sharded_render_equals_replicated(tiny_prep, eight_device_mesh):
    """Full ring-pass render (geometry sharded, shading from ring-carried
    vertices, shadow pass orbits too) == the replicated brute render."""
    import dataclasses

    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(tiny_prep.cfg.render, traversal="brute"),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_ring_grid_render_equals_replicated_packed(tiny_prep, eight_device_mesh):
    """Grid-accelerated ring pass: each shard marches rays through a
    packed grid over ITS slice (build_ring_grids).  Must equal the
    replicated packed render — the accelerated memory-scaling path."""
    import dataclasses

    from ray_tracer_tpu.parallel.shard import (
        build_ring_grids,
        render_sharded_geometry,
    )
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", fused_shadow=False,
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    want = np.asarray(render(prep))
    rg = build_ring_grids(prep, eight_device_mesh.shape["tris"])
    got = np.asarray(
        render_sharded_geometry(prep, mesh=eight_device_mesh, ring_grids=rg)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    # and the on-the-fly build path (no precomputed grids)
    got2 = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    np.testing.assert_array_equal(got, got2)


def test_ring_grid_tris_only_axis(tiny_prep):
    """1-D 'tris' mesh: every device holds 1/8 of the triangles and ALL
    rays orbit; grid hop path."""
    import dataclasses

    from ray_tracer_tpu.parallel.mesh import make_mesh
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare

    mesh = make_mesh(8, ("tris",), shape=(8,))
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", fused_shadow=False,
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    want = np.asarray(render(prep))
    got = np.asarray(
        render_sharded_geometry(prep, mesh=mesh, rays_axis=None)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def _reflective_prep(tiny_prep, **render_overrides):
    """gradcheck scene with the sphere material made reflective and
    mirror bounces on — the ring-bounce test scene."""
    import dataclasses

    from ray_tracer_tpu.render.renderer import prepare

    overrides = {"max_bounces": 2, **render_overrides}
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(tiny_prep.cfg.render, **overrides),
    )
    mats = tiny_prep.scene.materials._replace(
        reflective=jnp.asarray([False, True]),
        km=jnp.asarray([0.0, 0.6], jnp.float32),
    )
    return prepare(cfg, scene=tiny_prep.scene._replace(materials=mats))


def test_ring_render_bounces_equals_replicated(tiny_prep, eight_device_mesh):
    """Mirror bounces through the ring orbit (per-depth path + shadow
    orbits) == the replicated bounce loop — the reference's flagship
    3-bounce Parallel workload (raytracer.cu:508-520) now runs in the
    memory-scaling mode.  All-pairs hops."""
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry

    prep = _reflective_prep(tiny_prep, traversal="brute")
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_ring_grid_render_bounces_equals_replicated(tiny_prep, eight_device_mesh):
    """Mirror bounces with grid-march hops (the accelerated ring)."""
    from ray_tracer_tpu.parallel.shard import (
        build_ring_grids,
        render_sharded_geometry,
    )

    prep = _reflective_prep(
        tiny_prep, traversal="packed", det_dtype="float32",
        fused_shadow=False,
    )
    want = np.asarray(render(prep))
    rg = build_ring_grids(prep, eight_device_mesh.shape["tris"])
    got = np.asarray(
        render_sharded_geometry(prep, mesh=eight_device_mesh, ring_grids=rg)
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_ring_train_step_matches_replicated(tiny_prep, eight_device_mesh):
    """Backward through the ring orbit: the tris-sharded train step's
    loss AND parameter update must match the replicated step (SGD, so
    the update comparison IS a gradient comparison).  Closes the
    memory-scaling loop — a scene too big to replicate can be optimized,
    not just rendered (SURVEY §2 parallelism table, psum gradient row)."""
    import dataclasses

    from ray_tracer_tpu.opt.fit import (
        make_ring_train_step, make_train_step, split_scene,
    )
    from ray_tracer_tpu.render.renderer import prepare

    prep = _reflective_prep(
        tiny_prep, traversal="packed", det_dtype="float32",
        fused_shadow=False,
    )
    target = jnp.full((16, 16, 3), 40.0, jnp.float32)
    trainable = ("verts", "base_color", "km", "light_pos")

    # replicated reference step (single device, same packed traversal)
    params0 = split_scene(prep.scene)
    rstep, rinit = make_train_step(
        prep.packed.meta, prep.cfg, optimizer="sgd", lr=1e-3,
        trainable=trainable,
    )
    rp, _, rloss = rstep(params0, rinit(params0), prep.scene,
                         prep.packed.arrays, target)

    # ring step: geometry sharded over "tris", rays over both axes
    sstep, sinit, ring_scene = make_ring_train_step(
        prep, eight_device_mesh, optimizer="sgd", lr=1e-3,
        trainable=trainable,
    )
    sp, _, sloss = sstep(params0, sinit(params0), ring_scene, target)

    np.testing.assert_allclose(float(sloss), float(rloss), rtol=1e-5)
    # atol 1e-5: the per-shard scatter-add + psum accumulates vertex
    # grads in a different order than the replicated single scatter
    # (measured max disagreement 7e-7; losses agree to every digit)
    np.testing.assert_allclose(
        np.asarray(sp.verts), np.asarray(rp.verts), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sp.base_color), np.asarray(rp.base_color), rtol=1e-4,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(sp.km), np.asarray(rp.km), rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sp.light_pos), np.asarray(rp.light_pos), rtol=1e-4,
        atol=1e-8,
    )
    # frozen fields unchanged
    np.testing.assert_array_equal(np.asarray(sp.kd), np.asarray(params0.kd))


def test_ring_train_step_all_pairs(tiny_prep, eight_device_mesh):
    """Same, all-pairs hops (traversal='brute') vs the replicated brute
    step — no grid in the loop at all."""
    from ray_tracer_tpu.opt.fit import (
        make_ring_train_step, make_train_step, split_scene,
    )

    prep = _reflective_prep(tiny_prep, traversal="brute",
                            det_dtype="float32", max_bounces=0)
    target = jnp.full((16, 16, 3), 40.0, jnp.float32)
    params0 = split_scene(prep.scene)
    rstep, rinit = make_train_step(
        prep.grid.meta, prep.cfg, optimizer="sgd", lr=1e-3,
        trainable=("verts", "light_pos"),
    )
    rp, _, rloss = rstep(params0, rinit(params0), prep.scene,
                         prep.grid.arrays, target)
    sstep, sinit, ring_scene = make_ring_train_step(
        prep, eight_device_mesh, optimizer="sgd", lr=1e-3,
        trainable=("verts", "light_pos"),
    )
    sp, _, sloss = sstep(params0, sinit(params0), ring_scene, target)
    np.testing.assert_allclose(float(sloss), float(rloss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.verts), np.asarray(rp.verts), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sp.light_pos), np.asarray(rp.light_pos), rtol=1e-4,
        atol=1e-8,
    )


def test_ring_train_step_spp(tiny_prep, eight_device_mesh):
    """spp > 1 ring training (round 5): the tris-sharded step regroups
    the subsample-major camera batch PIXEL-major so each ray shard owns
    every subsample of its pixels and averages them shard-locally
    (opt/fit.pixel_major_rays); loss and SGD update must match the
    replicated spp=2 step.  All-pairs hops (exact parity) — grid hops
    at spp>1 inherit the documented per-shard probe-nudge boundary
    flips on subsample rays (see the render spp test above)."""
    from ray_tracer_tpu.opt.fit import (
        make_ring_train_step, make_train_step, split_scene,
    )

    prep = _reflective_prep(
        tiny_prep, traversal="brute", det_dtype="float32",
        fused_shadow=False, spp=2, max_bounces=1,
    )
    target = jnp.full((16, 16, 3), 40.0, jnp.float32)
    trainable = ("verts", "base_color", "light_pos")
    params0 = split_scene(prep.scene)
    rstep, rinit = make_train_step(
        prep.grid.meta, prep.cfg, optimizer="sgd", lr=1e-3,
        trainable=trainable,
    )
    rp, _, rloss = rstep(params0, rinit(params0), prep.scene,
                         prep.grid.arrays, target)
    sstep, sinit, ring_scene = make_ring_train_step(
        prep, eight_device_mesh, optimizer="sgd", lr=1e-3,
        trainable=trainable,
    )
    sp, _, sloss = sstep(params0, sinit(params0), ring_scene, target)
    np.testing.assert_allclose(float(sloss), float(rloss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.verts), np.asarray(rp.verts), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sp.base_color), np.asarray(rp.base_color), rtol=1e-4,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(sp.light_pos), np.asarray(rp.light_pos), rtol=1e-4,
        atol=1e-8,
    )


def test_sharded_persistent_render_equals_single(tiny_prep, eight_device_mesh):
    """Ray sharding with the persistent wavefront: one wave per shard,
    image == single-device persistent render."""
    import dataclasses

    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=64,
            fused_shadow=True,
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    single = np.asarray(render(prep))
    sharded = np.asarray(
        render_sharded(prep, mesh=eight_device_mesh, axis="rays")
    )
    np.testing.assert_array_equal(single, sharded)


@pytest.mark.parametrize("traversal,spp", [("brute", 2), ("packed", 1)])
def test_ring_render_spp_smooth_env_equals_replicated(
    tiny_prep, eight_device_mesh, traversal, spp
):
    """Ring feature parity (round 4): spp anti-aliasing, smooth
    Phong-interpolated normals (corner normals ride the ring payload)
    and a lat-long environment map (replicated array) through the ring
    renderer must match the replicated render.  spp=2 runs on all-pairs
    hops (exact); the grid-hop case runs at spp=1 because subsample
    rays can land on per-shard probe-nudge boundaries (the documented
    boundary-flip artifact of ring grids — ~1/256 pixels at spp=2)."""
    import dataclasses

    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal=traversal, fused_shadow=False, spp=spp,
            normal_mode="smooth",
        ),
    )
    env = jnp.asarray(
        np.linspace(0.0, 120.0, 8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3)
    )
    scene = tiny_prep.scene._replace(env_image=env)
    prep = prepare(cfg, scene=scene)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def _textured_quad_prep(texture: str, texture_image=None):
    """uv-mapped quad (the test_texture scene) prepared for the packed
    ring path."""
    import dataclasses

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes
    from ray_tracer_tpu.render.renderer import prepare

    quad = MeshArrays(
        verts=np.array(
            [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
        ),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        uv_faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 120.0, 60.0), kd=2.0, ks=0.0,
                         spec_alpha=4.0, ka=0.3)
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(quad, 0)], [mat], light)
    if texture_image is not None:
        scene = scene._replace(
            texture_image=jnp.asarray(texture_image, jnp.float32)
        )
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0,
                            width=16, height=16),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, det_dtype="float32",
            max_bounces=0, shadow_eps=1e-3, shadow_scale=0.5, ray_tile=256,
            traversal="packed", fused_shadow=False,
            texture=texture, texture_scale=2.0,
        ),
    )
    return prepare(cfg, scene=scene)


@pytest.mark.parametrize("texture", ["checker", "image"])
def test_ring_render_texture_equals_replicated(texture, eight_device_mesh):
    """Textures through the ring: corner uvs ride the payload, the
    texel grid replicates; checker and bilinear image modes both match
    the replicated packed render."""
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry

    img = None
    if texture == "image":
        rng = np.random.default_rng(5)
        img = rng.random((4, 4, 3)).astype(np.float32)
    prep = _textured_quad_prep(texture, texture_image=img)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_ring_render_soft_shadows_and_extra_lights(
    tiny_prep, eight_device_mesh
):
    """Area-light soft shadows (one any-hit orbit per Fibonacci sample)
    and extra point lights (one shadow orbit each) through the ring
    renderer == the replicated packed render."""
    import dataclasses

    from ray_tracer_tpu.config import LightConfig
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        extra_lights=(LightConfig(position=(-3.0, 6.0, 2.0), intensity=0.7),),
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", fused_shadow=False,
            shadow_samples=4, light_radius=0.4,
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_ring_soft_visibility_equals_replicated(eight_device_mesh):
    """Differentiable soft shadow silhouettes through the ring: the
    sigmoid margin is computed from the RING-CARRIED blocker vertices.
    Scene uses a single-triangle blocker so the blocker identity is
    unambiguous (any-hit picks can differ between schedulers on
    multi-triangle occluders) -> exact parity with the replicated
    render."""
    import dataclasses

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare, render

    _nouv = (np.zeros((0, 2), np.float32), np.zeros((0, 3), np.int32))
    floor = MeshArrays(
        np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                 np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32), *_nouv,
    )
    blocker = MeshArrays(
        np.array([[-0.8, 2.0, -0.8], [0.8, 2.0, -0.8], [0, 2.0, 0.9]],
                 np.float32),
        np.array([[0, 1, 2]], np.int32), *_nouv,
    )
    mat = MaterialConfig(base_color=(200.0, 120.0, 60.0), kd=2.0, ks=0.0,
                         spec_alpha=4.0, ka=0.3)
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(floor, 0), (blocker, 0)], [mat], light)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0,
                            width=16, height=16),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, det_dtype="float32",
            max_bounces=0, shadow_eps=1e-3, shadow_scale=0.5, ray_tile=256,
            traversal="packed", fused_shadow=False, soft_visibility=0.05,
        ),
    )
    prep = prepare(cfg, scene=scene)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_ring_soft_primary_equals_replicated(tiny_prep, eight_device_mesh):
    """Differentiable primary silhouettes in ring mode: each hit blends
    toward the background by its own barycentric margin computed from
    the ring-carried winner vertices — must match the replicated
    render (the nearest-hit merge is deterministic, unlike the any-hit
    blocker of soft_visibility).  Tolerance is looser than the other
    ring parity tests: per-shard Cramer FMA-contracts differently, and
    the tanh(margin/scale) blend amplifies those last-ulp barycentric
    differences near silhouettes (color units are 0-255)."""
    import dataclasses

    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", fused_shadow=False, soft_primary=0.05,
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=0.1, rtol=1e-3)


@pytest.mark.parametrize("traversal", ["packed", "brute"])
def test_ring_gi_matches_replicated(tiny_prep, eight_device_mesh, traversal):
    """Path-traced GI over ring-sharded geometry: every path segment and
    occlusion query orbits the ring; the integrator consumes the carried
    winner vertices/material through pathtrace_rays' tracer interface —
    the physics is the ONE replicated implementation, so for the SAME
    input rays the images match to traversal arithmetic.

    The reference here is pathtrace_rays on eagerly-generated camera
    rays (the rays render_sharded_geometry feeds the ring).  render_pt
    would NOT be bit-comparable: it generates camera rays inside its
    own jit, whose last-ulp differences change the ray-BIT sample-key
    hashes — a different (equally unbiased) Monte Carlo draw, not an
    error."""
    import dataclasses

    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays
    from ray_tracer_tpu.render.renderer import prepare

    env = jnp.asarray(
        np.linspace(5.0, 80.0, 4 * 8 * 3, dtype=np.float32).reshape(4, 8, 3)
    )
    scene = tiny_prep.scene._replace(env_image=env)
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal=traversal, fused_shadow=False,
            gi_samples=2, gi_depth=1,
        ),
    )
    prep = prepare(cfg, scene=scene)
    rays = camera_rays(cfg.camera, dtype=jnp.dtype(cfg.render.dtype))
    garr = (prep.packed.arrays if prep.packed is not None
            else prep.grid.arrays)
    gmeta = prep.packed.meta if prep.packed is not None else prep.grid.meta
    want = np.asarray(
        pathtrace_rays(rays, prep.scene, garr, gmeta, cfg)
    ).reshape(cfg.camera.height, cfg.camera.width, 3)
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("traversal", ["packed", "brute"])
def test_ring_gi_smooth_matches_replicated(tiny_prep, eight_device_mesh,
                                           traversal):
    """Ring GI smooth normals (round 5): the corner-normal payload rides
    the orbit (same _shade_payload rows as the Whitted ring) and the
    integrator Phong-interpolates it — must match the replicated smooth
    GI for the same input rays (same reference convention as the GI
    parity test above)."""
    import dataclasses

    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal=traversal, fused_shadow=False,
            gi_samples=2, gi_depth=1, normal_mode="smooth",
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    rays = camera_rays(cfg.camera, dtype=jnp.dtype(cfg.render.dtype))
    garr = (prep.packed.arrays if prep.packed is not None
            else prep.grid.arrays)
    gmeta = prep.packed.meta if prep.packed is not None else prep.grid.meta
    want = np.asarray(
        pathtrace_rays(rays, prep.scene, garr, gmeta, cfg)
    ).reshape(cfg.camera.height, cfg.camera.width, 3)
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("texture", ["checker", "image"])
def test_ring_gi_texture_matches_replicated(texture, eight_device_mesh):
    """Ring GI textures (round 5): corner uvs + has-uv flags ride the
    orbit, the texel grid replicates, and the integrator's albedo
    modulation matches the replicated textured GI."""
    import dataclasses

    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays
    from ray_tracer_tpu.render.renderer import prepare

    tex_img = (np.linspace(0.1, 1.0, 4 * 4 * 3, dtype=np.float32)
               .reshape(4, 4, 3) if texture == "image" else None)
    prep0 = _textured_quad_prep(texture, texture_image=tex_img)
    cfg = dataclasses.replace(
        prep0.cfg,
        render=dataclasses.replace(
            prep0.cfg.render, gi_samples=2, gi_depth=1,
        ),
    )
    prep = prepare(cfg, scene=prep0.scene)
    rays = camera_rays(cfg.camera, dtype=jnp.dtype(cfg.render.dtype))
    want = np.asarray(
        pathtrace_rays(rays, prep.scene, prep.packed.arrays,
                       prep.packed.meta, cfg)
    ).reshape(cfg.camera.height, cfg.camera.width, 3)
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("traversal", ["packed", "brute"])
def test_ring_gi_dielectric_matches_replicated(tiny_prep, eight_device_mesh,
                                               traversal):
    """Ring GI dielectrics (round 5): the (M,) transmissive/ior tables
    replicate into the geometry-free scene stub like the material
    table, so the Fresnel reflect/refract physics is the ONE
    pathtrace_rays implementation on both paths — ring must match the
    replicated glass render for the same input rays (the same
    reference convention as the other ring GI parity tests)."""
    import dataclasses

    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays
    from ray_tracer_tpu.render.renderer import prepare

    m = tiny_prep.scene.materials.base_color.shape[0]
    trans = np.zeros((m,), bool)
    trans[-1] = True  # one sphere's material turns to glass
    scene = tiny_prep.scene._replace(
        transmissive=jnp.asarray(trans),
        ior=jnp.full((m,), 1.5, jnp.float32),
        env_image=jnp.asarray(
            np.linspace(5.0, 80.0, 4 * 8 * 3, dtype=np.float32)
            .reshape(4, 8, 3)
        ),
    )
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal=traversal, fused_shadow=False,
            gi_samples=2, gi_depth=2,
        ),
    )
    prep = prepare(cfg, scene=scene)
    rays = camera_rays(cfg.camera, dtype=jnp.dtype(cfg.render.dtype))
    garr = (prep.packed.arrays if prep.packed is not None
            else prep.grid.arrays)
    gmeta = prep.packed.meta if prep.packed is not None else prep.grid.meta
    want = np.asarray(
        pathtrace_rays(rays, prep.scene, garr, gmeta, cfg)
    ).reshape(cfg.camera.height, cfg.camera.width, 3)
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
