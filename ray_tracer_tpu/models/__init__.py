from ray_tracer_tpu.models.materials import MaterialTable  # noqa: F401
from ray_tracer_tpu.models.scenes import (  # noqa: F401
    Scene,
    build_scene,
    serial_scene,
    parallel_scene,
    gradcheck_scene,
    flagship_scene,
)
