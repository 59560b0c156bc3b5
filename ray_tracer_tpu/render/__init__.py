from ray_tracer_tpu.render.renderer import (  # noqa: F401
    Prepared,
    prepare,
    render,
    render_rays,
)
