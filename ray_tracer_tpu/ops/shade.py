"""Blinn-Phong shading stages (batched, differentiable).

Reproduces both reference integrators:

  * `shade_serial` — Serial/raytracer.cpp:81-117: single implicit
    material, UNNORMALIZED geometric normal getNormalMod() =
    (v0-v1) x (v2-v0) (Serial/geometry.h:234-240), half-vector h = v + l
    left unnormalized (raytracer.cpp:95), light-intensity scaling on
    diffuse+specular only, shadow multiplying (spec+diff) by
    shadow_scale before the ambient term is added.

  * `shade_parallel` — Parallel/raytracer.cu:468-506: per-hit material
    table, normal (v2-v1) x (v0-v1) from the CUDA intersector
    (Parallel/geometry.cuh:160), normalized half-vector, hadamard
    base-color products, shadow halving the full local color.

Both are pure elementwise programs over (R,) hit batches — XLA fuses
them into the surrounding pipeline — and differentiable w.r.t. vertices,
materials and light.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.core import vecmath as vm
from ray_tracer_tpu.models.materials import MaterialTable


def apply_shadow(color: jnp.ndarray, shadow, scale: float) -> jnp.ndarray:
    """Shadow attenuation.  A BOOL mask takes the reference's exact
    branch (color * scale when shadowed — bitwise-faithful); a FLOAT
    factor f in [0,1] (soft visibility) blends continuously:
    color * (1 - f*(1-scale)), which equals the hard branch at f in
    {0,1} up to float rounding."""
    if shadow.dtype == jnp.bool_:
        return jnp.where(shadow[:, None], color * scale, color)
    return color * (1.0 - shadow * (1.0 - scale))[:, None]


def _pow_safe(base: jnp.ndarray, exponent: jnp.ndarray) -> jnp.ndarray:
    """pow with differentiable-safe base 0: forward equals C pow() for
    base >= 0 (0^a = 0 for a > 0, 0^0 = 1 — matching the reference's
    pow() for a spec_alpha=0 constant-specular material), but the
    a-gradient base^a * log(base) is computed on a guarded base so
    base == 0 yields 0, not 0 * -inf."""
    pos = base > 0
    safe = jnp.where(pos, base, 1.0)
    zero_pow = jnp.where(exponent == 0, 1.0, 0.0)
    return jnp.where(pos, jnp.power(safe, exponent), zero_pow)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                   serial: bool) -> jnp.ndarray:
    """Area-weighted vertex normals -> (V,3), UNNORMALIZED.

    Each face's unnormalized geometric normal — in the active shading
    variant's convention, so the smooth normal's hemisphere always
    agrees with the hard facet normal — is scatter-added to its three
    vertices; |cross| = 2*area gives the standard area weighting.
    Differentiable w.r.t. verts (the scatter-add's VJP is a gather).
    No reference counterpart (the reference shades flat facets only);
    production feature behind RenderConfig.normal_mode="smooth".
    """
    fv0 = verts[faces[:, 0]]
    fv1 = verts[faces[:, 1]]
    fv2 = verts[faces[:, 2]]
    if serial:
        fn = vm.cross(fv0 - fv1, fv2 - fv0)  # getNormalMod convention
    else:
        fn = vm.cross(fv2 - fv1, fv0 - fv1)  # geometry.cuh:160 convention
    # one batched scatter-add: faces (F,3) indexes axis 0, each face's
    # normal broadcast to its three corners (duplicates accumulate)
    upd = jnp.broadcast_to(fn[:, None, :], fn.shape[:1] + (3, 3))
    return jnp.zeros_like(verts).at[faces].add(upd)


def light_sample_offsets(n: int, radius: float) -> np.ndarray:
    """Deterministic Fibonacci-sphere point set scaled by radius ->
    (n,3) numpy offsets around the light center (a spherical area
    light for soft shadows).  The FIXED pattern is shared by every
    pixel: no RNG in the render path, so renders stay reproducible on
    any topology (the cost is banding instead of noise at low n).
    n == 1 returns the light CENTER (the hard-shadow limit), not a
    point on the sphere surface, so a one-sample 'area' light cannot
    displace every shadow sideways by the radius."""
    if n == 1:
        return np.zeros((1, 3), np.float32)
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (3.0 - np.sqrt(5.0)) * i  # golden-angle spiral
    return (radius * np.stack([
        np.cos(theta) * np.sin(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(phi),
    ], axis=1)).astype(np.float32)


def interpolate_normal(vn: jnp.ndarray, faces: jnp.ndarray, tri: jnp.ndarray,
                       beta: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """Barycentric (Phong) normal interpolation at hits -> UNIT normals.

    Callers that feed the reference shading variants should rescale by
    the facet normal's own magnitude: the variants shade with
    UNNORMALIZED normals whose length encodes facet area
    (Serial/raytracer.cpp:95 uses getNormalMod raw), and their shading
    constants are tuned to those magnitudes (serial ks = 5e11!) —
    smooth mode smooths the DIRECTION and keeps the magnitude, so
    brightness matches face mode."""
    f = faces[tri]  # (R,3)
    alpha = 1.0 - beta - gamma
    n = (alpha[:, None] * vn[f[:, 0]]
         + beta[:, None] * vn[f[:, 1]]
         + gamma[:, None] * vn[f[:, 2]])
    return vm.normalize(n)


class HitGeometry(NamedTuple):
    poi: jnp.ndarray  # (R,3) point of intersection
    normal: jnp.ndarray  # (R,3) geometric normal (unnormalized, as reference)
    view_dir: jnp.ndarray  # (R,3) normalized direction toward the eye


def hit_geometry_serial(orig, dirn, t, tv0, tv1, tv2) -> HitGeometry:
    poi = orig + dirn * t[:, None]
    normal = vm.cross(tv0 - tv1, tv2 - tv0)  # getNormalMod, geometry.h:234-240
    return HitGeometry(poi=poi, normal=normal, view_dir=vm.normalize(-dirn))


def hit_geometry_parallel(orig, dirn, t, tv0, tv1, tv2) -> HitGeometry:
    poi = orig + dirn * t[:, None]
    normal = vm.cross(tv2 - tv1, tv0 - tv1)  # geometry.cuh:160
    return HitGeometry(poi=poi, normal=normal, view_dir=vm.normalize(-dirn))


def shade_direct_serial(
    geom: HitGeometry,
    mat: MaterialTable,  # gathered per-ray
    light_pos: jnp.ndarray,
    light_intensity: jnp.ndarray,
) -> jnp.ndarray:
    """ONE light's diffuse+specular term, serial-variant conventions
    (no ambient — that is counted once by the caller).  The multi-light
    building block: shade_serial == apply_shadow(this) + ambient."""
    base = mat.base_color
    l = vm.normalize(light_pos - geom.poi)
    h = geom.view_dir + l  # NOT normalized (raytracer.cpp:95)
    n = geom.normal

    n_dot_l = jnp.maximum(0.0, vm.dot(n, l))
    n_dot_h = jnp.maximum(0.0, vm.dot(n, h))
    diffuse = base * (mat.kd * n_dot_l)[:, None] * light_intensity
    specular = base * (mat.ks * _pow_safe(n_dot_h, mat.spec_alpha))[:, None] * light_intensity
    return specular + diffuse


def shade_serial(
    geom: HitGeometry,
    mat: MaterialTable,  # gathered per-ray
    light_pos: jnp.ndarray,
    light_intensity: jnp.ndarray,
    in_shadow: jnp.ndarray,
    shadow_scale: float,
) -> jnp.ndarray:
    color = shade_direct_serial(geom, mat, light_pos, light_intensity)
    color = apply_shadow(color, in_shadow, shadow_scale)
    return color + mat.base_color * mat.ka[:, None]


def shade_direct_parallel(
    geom: HitGeometry,
    mat: MaterialTable,
    light_pos: jnp.ndarray,
) -> jnp.ndarray:
    """ONE light's diffuse+specular term, parallel-variant conventions
    (no ambient).  The CUDA reference has no light-intensity scalar —
    multi-light callers scale this by their own intensity (1.0 = the
    reference's implicit intensity)."""
    base = mat.base_color
    l = vm.normalize(light_pos - geom.poi)
    h = vm.normalize(geom.view_dir + l)  # normalized (raytracer.cu:478)
    n = geom.normal

    n_dot_l = jnp.maximum(0.0, vm.dot(n, l))
    n_dot_h = jnp.maximum(0.0, vm.dot(n, h))
    diffuse = base * n_dot_l[:, None] * mat.kd[:, None]
    specular = base * _pow_safe(n_dot_h, mat.spec_alpha)[:, None] * mat.ks[:, None]
    return diffuse + specular


def shade_parallel(
    geom: HitGeometry,
    mat: MaterialTable,
    light_pos: jnp.ndarray,
    in_shadow: jnp.ndarray,
    shadow_scale: float,
) -> jnp.ndarray:
    color = (shade_direct_parallel(geom, mat, light_pos)
             + mat.base_color * mat.ka[:, None])
    return apply_shadow(color, in_shadow, shadow_scale)
