"""Multi-host entry layer, tested with N local processes (CPU + gloo).

Real pods are unavailable here; ``jax.distributed`` over localhost with
the gloo CPU collectives transport exercises the same code paths —
cluster formation, cross-process device federation, DCN-aware mesh
construction, and the scaling harness (SURVEY §5.8).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(n_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    import re

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


WORKER = """
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from gptq_v2_tpu.parallel import mesh as M
ok = M.init_distributed("127.0.0.1:{port}", {n}, int(sys.argv[1]))
assert ok and jax.process_count() == {n}
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = M.make_dcn_mesh()  # tp = per-host devices, dp = hosts
assert mesh.shape[M.DATA_AXIS] == {n}, mesh.shape
# every model-axis row must stay within one process (DCN policy)
for row in mesh.devices:
    assert len(set(d.process_index for d in row)) == 1, mesh.devices
def body(x):
    return jax.lax.psum(x, M.MODEL_AXIS) + jax.lax.psum(x, M.DATA_AXIS)
f = jax.jit(jax.shard_map(body, mesh=mesh,
                          in_specs=P(M.DATA_AXIS, M.MODEL_AXIS),
                          out_specs=P(M.DATA_AXIS, M.MODEL_AXIS)))
dp, tp = mesh.shape[M.DATA_AXIS], mesh.shape[M.MODEL_AXIS]
x = jax.device_put(jnp.arange(float(dp * tp)).reshape(dp, tp),
                   NamedSharding(mesh, P(M.DATA_AXIS, M.MODEL_AXIS)))
y = f(x)
shard = np.asarray(jax.device_get(y.addressable_shards[0].data))
xs = np.arange(float(dp * tp)).reshape(dp, tp)
want = xs.sum(1, keepdims=True) + xs.sum(0, keepdims=True)
pid = int(sys.argv[1])
np.testing.assert_allclose(shard, want[pid:pid+1, :1])
print("WORKER_OK", flush=True)
"""


class TestCluster:
    def test_psum_across_processes(self, tmp_path):
        """2 processes x 2 virtual devices: DCN mesh forms with the model
        axis inside each process, and cross-process psums are correct."""
        n, port = 2, _free_port()
        code = WORKER.format(root=str(ROOT), port=port, n=n)
        procs = [subprocess.Popen([sys.executable, "-c", code, str(i)],
                                  env=_child_env(2), cwd=str(ROOT),
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True)
                 for i in range(n)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
            assert "WORKER_OK" in out, f"proc {i}:\n{out[-3000:]}"

    def test_scaling_harness_multiprocess(self):
        """scripts/bench_scaling.py over 2 processes reports an aggregate
        '2 hosts' configuration with real tokens/s."""
        n, port = 2, _free_port()
        cmd = lambda i: [sys.executable, "scripts/bench_scaling.py",
                         "--coordinator", f"127.0.0.1:{port}",
                         "--num-processes", str(n), "--process-id", str(i),
                         "--tiny", "--cpu-devices", "2", "--batch", "4",
                         "--steps", "4", "--max-seq", "32"]
        procs = [subprocess.Popen(cmd(i), env=_child_env(2), cwd=str(ROOT),
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True)
                 for i in range(n)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
        rows = [json.loads(l) for l in outs[0].splitlines()
                if l.startswith("{")]
        two = [r for r in rows if r["config"] == "2 hosts"]
        assert two and two[0]["tok_s"] > 0 and two[0]["dp"] == 2, rows
        assert not any(l.startswith("{") for l in outs[1].splitlines())
