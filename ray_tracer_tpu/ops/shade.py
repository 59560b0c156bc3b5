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

from ray_tracer_tpu.core import vecmath as vm
from ray_tracer_tpu.models.materials import MaterialTable


def _apply_shadow(color: jnp.ndarray, shadow, scale: float) -> jnp.ndarray:
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


def shade_serial(
    geom: HitGeometry,
    mat: MaterialTable,  # gathered per-ray
    light_pos: jnp.ndarray,
    light_intensity: jnp.ndarray,
    in_shadow: jnp.ndarray,
    shadow_scale: float,
) -> jnp.ndarray:
    base = mat.base_color
    l = vm.normalize(light_pos - geom.poi)
    h = geom.view_dir + l  # NOT normalized (raytracer.cpp:95)
    n = geom.normal

    n_dot_l = jnp.maximum(0.0, vm.dot(n, l))
    n_dot_h = jnp.maximum(0.0, vm.dot(n, h))
    diffuse = base * (mat.kd * n_dot_l)[:, None] * light_intensity
    specular = base * (mat.ks * _pow_safe(n_dot_h, mat.spec_alpha))[:, None] * light_intensity
    ambient = base * mat.ka[:, None]

    color = specular + diffuse
    color = _apply_shadow(color, in_shadow, shadow_scale)
    return color + ambient


def shade_parallel(
    geom: HitGeometry,
    mat: MaterialTable,
    light_pos: jnp.ndarray,
    in_shadow: jnp.ndarray,
    shadow_scale: float,
) -> jnp.ndarray:
    base = mat.base_color
    l = vm.normalize(light_pos - geom.poi)
    h = vm.normalize(geom.view_dir + l)  # normalized (raytracer.cu:478)
    n = geom.normal

    n_dot_l = jnp.maximum(0.0, vm.dot(n, l))
    n_dot_h = jnp.maximum(0.0, vm.dot(n, h))
    diffuse = base * n_dot_l[:, None] * mat.kd[:, None]
    specular = base * _pow_safe(n_dot_h, mat.spec_alpha)[:, None] * mat.ks[:, None]
    ambient = base * mat.ka[:, None]

    color = diffuse + specular + ambient
    return _apply_shadow(color, in_shadow, shadow_scale)
