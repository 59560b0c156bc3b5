"""Axis-aligned bounding boxes.

Counterpart of the reference's boundingBox (Serial/geometry.h:244-316):
point union, max-extent axis, inside test, and the slab-method ray
intersection returning the clipped parametric interval [t0, t1].
All ops are batched over leading axes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ray_tracer_tpu.core.rays import RayBatch


class AABB(NamedTuple):
    lower: jnp.ndarray  # (3,) or (...,3)
    upper: jnp.ndarray

    @staticmethod
    def of_points(points: jnp.ndarray) -> "AABB":
        """Bounding box of a (N,3) point cloud (grid.h:82-86 union loop)."""
        return AABB(jnp.min(points, axis=0), jnp.max(points, axis=0))

    def max_axis(self) -> jnp.ndarray:
        """Index of the largest extent axis (geometry.h:276-285)."""
        return jnp.argmax(self.upper - self.lower)

    def inside(self, pt: jnp.ndarray) -> jnp.ndarray:
        """Inclusive containment test (geometry.h:287-289); (...,3)->(...)."""
        return jnp.all((pt >= self.lower) & (pt <= self.upper), axis=-1)


def slab_intersect(
    box: AABB, rays: RayBatch
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB test (reference: Serial/geometry.h:291-315).

    Starts the interval at [mint, maxt] exactly like the reference and
    shrinks it per axis.  Returns (hit, t0, t1).

    Note the reference computes 1/dir with no zero guard — an axis-parallel
    ray yields +/-inf tNear/tFar which IEEE semantics resolve correctly
    except when (min - orig) == 0 (0 * inf = NaN).  The reference inherits
    that NaN behavior; comparisons with NaN are false so t0/t1 simply stop
    updating on that axis, which `jnp.where` reproduces here.
    """
    inv = 1.0 / rays.dirn  # (R,3); may be +/-inf
    t_near = (box.lower - rays.orig) * inv
    t_far = (box.upper - rays.orig) * inv
    lo = jnp.minimum(t_near, t_far)
    hi = jnp.maximum(t_near, t_far)

    t0, t1 = rays.mint, rays.maxt
    for axis in range(3):
        t0 = jnp.where(lo[:, axis] > t0, lo[:, axis], t0)
        t1 = jnp.where(hi[:, axis] < t1, hi[:, axis], t1)
    hit = t0 <= t1
    return hit, t0, t1
