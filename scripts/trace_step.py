"""Op-level device trace of the inference model step (batch 8, bf16).

Captures a jax.profiler device trace of N model steps and prints the
per-HLO/fusion durations aggregated by op name, so optimization targets
are measured rather than guessed.

Run alone on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/trace_step.py
"""

import glob
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    rng = np.random.default_rng(0)
    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16, chunk=1)
    step = pred._build_model_step(True)

    wins = jnp.asarray(rng.random((1, 8, 64, 64, 64, 1), np.float32))
    afs = jnp.asarray(
        (rng.random((1, 8, 64, 64, 64)) * 2**24).astype(np.uint32)
    )

    out = step(pred.params, wins, afs, 1)
    jax.block_until_ready(out)
    _ = np.asarray(out[0].ravel()[0])

    trace_dir = "/tmp/mica_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = step(pred.params, wins, afs, 1)
        jax.block_until_ready(out)
        _ = np.asarray(out[0].ravel()[0])

    # parse the Chrome trace JSON the profiler writes next to the xplane
    # (tensorboard_plugin_profile's converter is broken in this image) and
    # aggregate device-lane op durations by name
    import gzip
    import json
    from collections import defaultdict

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace captured"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: pids whose process_name mentions TPU/device XLA ops
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "/device:" in n or "TPU" in n or "XLA Op" in n}
    if not dev_pids:  # fall back: everything except python/host threads
        dev_pids = {p for p, n in names.items() if "python" not in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"lanes: {sorted(names[p] for p in dev_pids)}")
    print(f"total device time: {total/1e3/3:.1f} ms/step (3 steps)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{dur/1e3/3:9.2f} ms  {dur/total*100:5.1f}%  {name[:110]}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
