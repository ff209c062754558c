"""Multi-host integration test: 2 processes x 4 virtual CPU devices form an
8-device global mesh via jax.distributed — the capability the reference
nominally parameterizes (world_size/rank, segmentation/tool/train.py:43-44)
but hard-codes to localhost and cannot test without GPUs.

The worker keeps the model tiny (a linear head) on purpose: model math is
covered by the single-process suites; this test pins the multi-process
machinery — cluster init, global mesh spanning both processes, per-host
data feeding via host_local_batch, and a psum-carrying jitted step whose
result must agree bit-for-bit on every host.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from repsurf_tpu.parallel.distributed import (
    host_local_batch, init_distributed, local_batch_size, process_info,
)
from repsurf_tpu.parallel.mesh import make_mesh, replicate

coord, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coord, num_processes=2, process_id=pid)
idx, count = process_info()
assert (idx, count) == (pid, 2), (idx, count)
assert len(jax.devices()) == 8, len(jax.devices())

mesh = make_mesh()
B_global = 8
B_local = local_batch_size(B_global)
assert B_local == 4

rng = np.random.RandomState(100 + pid)  # each host loads its own shard
local = {
    "x": rng.randn(B_local, 16).astype(np.float32),
    "y": rng.randn(B_local, 1).astype(np.float32),
}
batch = host_local_batch(local, mesh)
assert batch["x"].shape == (B_global, 16)

w = replicate(jnp.zeros((16, 1), jnp.float32), mesh)

@jax.jit
def step(w, batch):
    def loss_fn(w):
        pred = batch["x"] @ w
        return jnp.mean(jnp.square(pred - batch["y"]))
    loss, g = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * g, loss

for _ in range(3):
    w, loss = step(w, batch)
print(f"RESULT {pid} {float(loss):.10f} {float(jnp.sum(jnp.abs(w))):.10f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"localhost:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out
        outs.append(line[0].split()[2:])
    # both hosts computed over the same global batch: identical loss/params
    np.testing.assert_array_equal(outs[0], outs[1])
