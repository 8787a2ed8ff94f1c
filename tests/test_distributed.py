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
@pytest.mark.slow
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
@pytest.mark.slow
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


@pytest.mark.slow
def test_virtual_mesh_step_time_flatness():
    """Data-parallel scaling sanity on the virtual 8-device CPU mesh
    (VERDICT r2 #5): a global batch of 8 sharded 1-per-device must not
    cost materially more wall time than the same batch on one device —
    the total FLOPs are identical, so a blow-up means the sharding
    replicated compute or inserted pathological collectives.  The bound
    is loose (3x) because the 8 virtual devices share one host core and
    the comparison only needs to catch catastrophic regressions."""
    import time

    import numpy as np

    import jax.numpy as jnp

    from mica_tpu.parallel.mesh import make_mesh
    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    import jax

    assert jax.device_count() >= 8, "conftest forces an 8-device CPU mesh"
    batch_np = synthetic_batch(batch_size=8, size=32)
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    key = jax.random.PRNGKey(0)

    def timed_steps(trainer, iters=3):
        state = trainer.init_state((1, 32, 32, 32, 1))
        batch = tuple(jnp.asarray(b) for b in batch_np)
        step = trainer.train_step_for_epoch(0)
        state, m = step(state, batch, lambdas, key)  # compile + warm
        jax.block_until_ready(m["total_loss"])
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, batch, lambdas, key)
        jax.block_until_ready(m["total_loss"])
        loss = float(np.asarray(m["total_loss"]))
        assert np.isfinite(loss)
        return (time.time() - t0) / iters

    t1 = timed_steps(Trainer(base_filters=16, use_mesh=False,
                             use_augmentation=False))
    t8 = timed_steps(Trainer(base_filters=16, mesh=make_mesh(),
                             use_augmentation=False))
    assert t8 < 3.0 * t1 + 0.5, (
        f"8-device sharded step {t8:.2f}s vs single-device {t1:.2f}s — "
        "data-parallel sharding is replicating work"
    )
