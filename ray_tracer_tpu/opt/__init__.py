from ray_tracer_tpu.opt.fit import (
    SceneParams,
    image_loss,
    make_train_step,
    merge_scene,
    split_scene,
)

__all__ = [
    "SceneParams",
    "image_loss",
    "make_train_step",
    "merge_scene",
    "split_scene",
]
