"""2-process DCN dryrun: jax.distributed + host-local data sharding.

Launches two REAL OS processes (the DCN boundary), each owning 2 virtual CPU
devices, forming one 4-device global "dp" mesh via jax.distributed. Each
process loads only its half of the batch (host-local loading via
make_array_from_process_local_data) and runs one jitted data-parallel
loss+gradient step; the psum'd loss must be identical across processes and
equal to the single-process value on the full batch.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax, jax.numpy as jnp

from d3il_tpu.parallel import distributed as dist
from d3il_tpu.parallel import mesh as pmesh

assert dist.initialize_from_env(), "distributed init did not trigger"
mesh = dist.global_mesh()
assert jax.device_count() == 4 and jax.process_count() == 2

# deterministic global batch; each process loads ONLY its own half
B, D = 8, 5
full_x = np.arange(B * D, dtype=np.float32).reshape(B, D) / 10.0
full_y = np.ones((B, 1), np.float32)
sl = dist.process_shard(B)
local_x, local_y = full_x[sl], full_y[sl]
gx, gy = dist.host_local_batch(mesh, (local_x, local_y))
assert gx.shape == (B, D), gx.shape

w = jnp.ones((D, 1), jnp.float32) * 0.1
w = pmesh.replicate(mesh, w)

@jax.jit
def loss_and_grad(w, x, y):
    x, y = pmesh.constrain_batch((x, y), mesh)
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)
    return jax.value_and_grad(loss)(w)

l, g = loss_and_grad(w, gx, gy)
print(json.dumps({"process": jax.process_index(),
                  "loss": float(l), "gnorm": float(jnp.linalg.norm(g))}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_dryrun(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "D3IL_COORD_ADDR": f"127.0.0.1:{port}",
            "D3IL_NUM_PROCS": "2",
            "D3IL_PROC_ID": str(pid),
            "PYTHONPATH": repo,
        })
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = sorted((o["process"], o["loss"]) for o in outs)
    assert losses[0][1] == pytest.approx(losses[1][1], rel=1e-6), \
        "psum'd loss differs across processes"

    # single-process ground truth on the full batch
    B, D = 8, 5
    x = np.arange(B * D, dtype=np.float32).reshape(B, D) / 10.0
    y = np.ones((B, 1), np.float32)
    w = np.ones((D, 1), np.float32) * 0.1
    ref = float(np.mean((x @ w - y) ** 2))
    assert losses[0][1] == pytest.approx(ref, rel=1e-5)
