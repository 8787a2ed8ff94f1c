"""Op-level device trace of the TRAINING step (batch 8, remat, bf16).

Same mechanics as trace_step.py, aimed at the 2.66 s training step:
captures a device trace of N steps and aggregates per-HLO durations so
the forward/backward/remat/augment/optimizer split is measured, not
guessed.

Run alone on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/trace_train_step.py
"""

import glob
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    trainer = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                      use_augmentation=True, remat=True)
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch_dev = tuple(jnp.asarray(b) for b in synthetic_batch(batch_size=8,
                                                              size=64))
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    step = trainer.train_step_for_epoch(0)
    key = jax.random.PRNGKey(0)

    state, metrics = step(state, batch_dev, lambdas, key)
    jax.block_until_ready(metrics["total_loss"])
    _ = float(np.asarray(metrics["total_loss"]))

    n_steps = 2
    trace_dir = "/tmp/mica_train_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, batch_dev, lambdas, key)
        jax.block_until_ready(metrics["total_loss"])
        _ = float(np.asarray(metrics["total_loss"]))

    import gzip
    import json
    from collections import defaultdict

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace captured"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "/device:" in n or "TPU" in n or "XLA Op" in n}
    if not dev_pids:
        dev_pids = {p for p, n in names.items() if "python" not in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"total device time: {total/1e3/n_steps:.1f} ms/step "
          f"({n_steps} steps)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:50]:
        print(f"{dur/1e3/n_steps:9.2f} ms  {dur/total*100:5.1f}%  "
              f"{name[:110]}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
