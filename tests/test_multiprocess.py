"""Simulated multi-host: 2 OS processes join a jax.distributed group
over localhost and render the sharded image; every host's addressable
shards must equal a single-device render bit-for-bit."""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


@pytest.mark.timeout(300)
@pytest.mark.parametrize("n,port", [(2, "9923"), (4, "9931")])
def test_n_process_sharded_render_matches(n, port, tmp_path):
    """2- and 4-process groups: sharded render == single-device render
    on every host's shards, and host 0 assembles + writes the PPM."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(HERE) + ":" + env.get("PYTHONPATH", "")
    # fresh interpreters: force plain CPU, no virtual-device flag needed
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, port, str(n), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
    assert os.path.exists(os.path.join(str(tmp_path), "multihost.ppm"))
