from ray_tracer_tpu.io.obj import load_obj, MeshArrays  # noqa: F401
from ray_tracer_tpu.io.ppm import write_ppm, read_ppm, tonemap_u8  # noqa: F401
