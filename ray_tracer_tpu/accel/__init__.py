from ray_tracer_tpu.accel.grid import (  # noqa: F401
    GridArrays,
    GridMeta,
    UniformGrid,
    build_grid,
)
