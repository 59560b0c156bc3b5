"""Worker process for the multi-process (simulated multi-host) test.

Each instance is one fake 'host': it joins the jax.distributed process
group over localhost, renders the sharded image on the global mesh, and
asserts its addressable shards equal a locally-computed single-device
render (SURVEY §4: 'multi-host without a pod').
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")


def main() -> None:
    port = sys.argv[1]
    num = int(sys.argv[2])
    pid = int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    from ray_tracer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}", num_processes=num, process_id=pid
    )
    assert jax.process_count() == num, jax.process_count()

    import dataclasses

    import numpy as np

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.parallel.shard import render_sharded
    from ray_tracer_tpu.render.renderer import prepare, render

    scene, cfg = gradcheck_scene(16, 16)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64)
    )
    prep = prepare(cfg, scene=scene)
    img = render_sharded(prep, mesh=multihost.global_mesh(("rays",)))
    single = np.asarray(render(prep))  # replicated local computation
    for shard in img.addressable_shards:
        assert np.array_equal(np.asarray(shard.data), single[shard.index]), (
            f"process {pid}: shard {shard.index} mismatch"
        )
    assert not multihost.is_host0() or pid == 0
    lo, hi = multihost.host_tile_bounds(256)
    assert 0 <= lo <= hi <= 256

    # host-0 framebuffer assembly + PPM artifact (the runnable multi-
    # host demo: every host contributes shards, host 0 writes the file)
    out_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if out_dir:
        from ray_tracer_tpu.io.ppm import read_ppm, tonemap_u8

        path = os.path.join(out_dir, "multihost.ppm")
        wrote = multihost.write_ppm_host0(path, img)
        assert wrote == (pid == 0)
        if wrote:
            assert np.array_equal(read_ppm(path), tonemap_u8(single)), (
                "host-0 assembled PPM differs from the replicated render"
            )
    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()
