from ray_tracer_tpu.utils.timing import Timer, measure_mrays
from ray_tracer_tpu.utils.log import get_logger

__all__ = ["Timer", "measure_mrays", "get_logger"]
