from ray_tracer_tpu.core.vecmath import (  # noqa: F401
    cross,
    dot,
    length,
    normalize,
    reflect,
)
from ray_tracer_tpu.core.rays import RayBatch  # noqa: F401
from ray_tracer_tpu.core.aabb import AABB  # noqa: F401
