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
def test_two_process_sharded_render_matches():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(HERE) + ":" + env.get("PYTHONPATH", "")
    # fresh interpreters: force plain CPU, no virtual-device flag needed
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "9923", "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
