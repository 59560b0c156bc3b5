"""Material tables as SoA device arrays.

The reference's material is a POD struct rebuilt inside every shading
call (Parallel/geometry.cuh:284-303, table at Parallel/raytracer.cu:449-453).
Here the table is a pytree of (M,) arrays gathered per hit with one fused
take — differentiable w.r.t. every field.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ray_tracer_tpu.config import MaterialConfig


class MaterialTable(NamedTuple):
    base_color: jnp.ndarray  # (M,3)
    kd: jnp.ndarray  # (M,)
    ks: jnp.ndarray
    spec_alpha: jnp.ndarray
    ka: jnp.ndarray
    km: jnp.ndarray
    reflective: jnp.ndarray  # (M,) bool

    @staticmethod
    def from_configs(mats: Sequence[MaterialConfig], dtype=jnp.float32) -> "MaterialTable":
        return MaterialTable(
            base_color=jnp.asarray([m.base_color for m in mats], dtype=dtype),
            kd=jnp.asarray([m.kd for m in mats], dtype=dtype),
            ks=jnp.asarray([m.ks for m in mats], dtype=dtype),
            spec_alpha=jnp.asarray([m.spec_alpha for m in mats], dtype=dtype),
            ka=jnp.asarray([m.ka for m in mats], dtype=dtype),
            km=jnp.asarray([m.km for m in mats], dtype=dtype),
            reflective=jnp.asarray([m.reflective for m in mats], dtype=bool),
        )

    def gather(self, index: jnp.ndarray) -> "MaterialTable":
        """Per-hit material lookup: (R,) indices -> per-ray material arrays."""
        return MaterialTable(*(f[index] for f in self))


# The exact 4-entry palette hard-coded by the reference's shading kernel
# (Parallel/raytracer.cu:449-453): plane=blue reflective km=0.6,
# spot=red, blub=dark green reflective km=0.9999, spot2=red.
PARALLEL_REFERENCE_MATERIALS = (
    MaterialConfig(base_color=(0.0, 0.0, 255.0), kd=1.0, ks=1.5, spec_alpha=1.25, ka=0.3, reflective=True, km=0.6),
    MaterialConfig(base_color=(255.0, 0.0, 0.0), kd=10.0, ks=10.0, spec_alpha=1.25, ka=0.3, reflective=False, km=0.0),
    MaterialConfig(base_color=(0.0, 20.0, 0.0), kd=10.0, ks=10.0, spec_alpha=1.25, ka=0.3, reflective=True, km=0.9999),
    MaterialConfig(base_color=(255.0, 0.0, 0.0), kd=10.0, ks=10.0, spec_alpha=1.25, ka=0.3, reflective=False, km=0.0),
)

# The serial variant's single implicit material
# (constants at Serial/raytracer.cpp:83-89; mesh color set by load_mesh).
SERIAL_REFERENCE_MATERIAL = MaterialConfig(
    base_color=(255.0, 0.0, 0.0), kd=2.0, ks=5.0e11, spec_alpha=4.0, ka=0.2,
    reflective=False, km=0.0,
)
