"""Multi-process (2 virtual hosts on CPU) smoke test for the
jax.distributed entry: global mesh forms across processes, a sharded
computation with a cross-process psum produces the right value.

Each worker is a fresh subprocess (the distributed runtime cannot share
the test process's already-initialized backend).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import jax.numpy as jnp

from mica_tpu.parallel import distributed

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2, process_id=pid,
                       backend="cpu")

# the cpu backend is pinned explicitly: on this host the axon TPU plugin
# wins the default-backend election even under JAX_PLATFORMS=cpu
assert jax.process_count("cpu") == 2, jax.process_count("cpu")
assert jax.device_count("cpu") == 8, jax.device_count("cpu")
assert jax.local_device_count("cpu") == 4

mesh = distributed.global_mesh(backend="cpu")
assert mesh.devices.size == 8

# global batch 8, each process feeds its local half
sl = distributed.local_batch_slice(8, backend="cpu")
assert (sl.stop - sl.start) == 4
full = np.arange(8, dtype=np.float32).reshape(-1, 1) * np.ones((1, 16), np.float32)
garr = distributed.make_global_batch(full[sl], mesh, 8)

@jax.jit
def total(x):
    return jnp.sum(x)

# compile first, meet at a coordination barrier, then execute: the gloo
# rendezvous window must not absorb cross-process compile/startup skew
compiled = total.lower(garr).compile()
distributed.barrier("smoke_compiled", timeout_seconds=600)
got = float(compiled(garr))
expect = float(full.sum())
assert got == expect, (got, expect)
print(f"proc {pid}: ok total={got}")
"""


TRAIN_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from mica_tpu.parallel import distributed
from mica_tpu.train import data
from mica_tpu.train.loss import task_lambdas
from mica_tpu.train.trainer import Trainer

addr, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=addr, num_processes=2, process_id=pid,
                       shutdown_timeout_seconds=900, backend="cpu")
mesh = distributed.global_mesh(backend="cpu")
assert mesh.devices.size == 8
print(f"proc {pid}: mesh up", flush=True)

trainer = Trainer(base_filters=16, mesh=mesh, use_augmentation=False)
size = 16
state = trainer.init_state((1, size, size, size, 1))

# global batch 8; each process feeds its 4 rows via explicit shards
full = data.synthetic_batch(batch_size=8, size=size)
sl = distributed.local_batch_slice(8, backend="cpu")
batch = tuple(distributed.make_global_batch(np.asarray(b[sl]), mesh, 8)
              for b in full)
step = trainer.train_step_for_epoch(0)
lambdas = jnp.asarray(task_lambdas(0), jnp.float32)

# compile BEFORE the first collective executes: the gloo context
# rendezvous times out after ~30 s, while the step compile takes minutes
# and can be asymmetric across processes (compile-cache races).  Both
# processes compile ahead of time, meet at a coordination-service
# barrier, then execute within the rendezvous window.
compiled = step.lower(state, batch, lambdas, jax.random.PRNGKey(0)).compile()
print(f"proc {pid}: compiled", flush=True)
distributed.barrier("train_step_compiled", timeout_seconds=900)

state, metrics = compiled(state, batch, lambdas, jax.random.PRNGKey(0))
loss = float(metrics["total_loss"])
assert np.isfinite(loss), loss
print(f"proc {pid}: train ok loss={loss:.6f}")
"""


def _worker_env() -> dict:
    """Subprocess env for CPU gloo workers.

    Scrubs the axon TPU plugin trigger: sitecustomize dials the tunneled
    TPU at *interpreter start* (before any worker code runs), so a degraded
    relay hangs the worker outright — no amount of backend pinning inside
    the script can help.  CPU workers must never register that plugin.
    """
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1]) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    # the conftest env for the in-process suite must not leak device counts
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.mark.skipif(os.environ.get("MICA_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_virtual_hosts(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous for worst-case startup skew on a contended 1-core host
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: ok" in out


@pytest.mark.skipif(os.environ.get("MICA_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_host_training_step(tmp_path):
    """Full SPMD training step (params replicated, batch sharded, psum
    gradient reduction) across 2 processes: both see the same finite loss."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), addr, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous: the SPMD step cold-compiles for minutes on this
            # single-core host, slower still under full-suite contention
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed train workers timed out")
        outs.append(out)
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if f"proc {i}: train ok" in l]
        assert line, out[-2000:]
        losses.append(float(line[0].rsplit("=", 1)[1]))
    # replicated params + psum: both processes report the identical loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
