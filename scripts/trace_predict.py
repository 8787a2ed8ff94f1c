"""Device+host timeline of one full predict_volume on the bench workload.

All programs must already be in the persistent compile cache (run bench.py
first).  Prints per-program device time and the total device-idle share of
the inference wall time — the dispatch-gap number the engine loop design
is trying to drive to zero.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/trace_predict.py
"""

import glob
import gzip
import json
import time
from collections import defaultdict

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
    map_shape = (256, 256, 256)
    grid = np.indices((64, 64, 64), dtype=np.float32) * 4.0
    coarse = np.zeros((64, 64, 64), np.float32)
    for c in rng.uniform(64, 192, size=(40, 3)).astype(np.float32):
        coarse += np.exp(-((grid[0] - c[0]) ** 2 + (grid[1] - c[1]) ** 2
                           + (grid[2] - c[2]) ** 2) / (2 * 18.0 ** 2),
                         dtype=np.float32)
    coarse /= max(coarse.max(), 1e-6)
    dense_region = np.kron(coarse > 0.05, np.ones((4, 4, 4), np.float32))
    volume = dense_region * rng.random(map_shape, dtype=np.float32)
    af = ((rng.random((24,) + map_shape) < 0.01) & (dense_region > 0)).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model, (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
                jnp.zeros((1, 64, 64, 64, 24), jnp.float32)))
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16)
    pred.predict_volume(volume, af, keep_on_device=True)  # warm

    trace_dir = "/tmp/mica_trace_pred"
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        out = pred.predict_volume(volume, af, keep_on_device=True)
        _ = np.asarray(out["backbone_probability"][0, 0, 0])
    wall = time.time() - t0
    print(f"wall {wall:.3f}s  inference {pred.timing['inference']:.3f}s  "
          f"setup {pred.timing['setup']:.3f}s")

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    names = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "/device:" in n or "TPU" in n}
    agg = defaultdict(float)
    spans = []
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            if e["name"].startswith("jit_"):  # umbrella modules
                agg[e["name"].split("(")[0]] += e["dur"]
                spans.append((e["ts"], e["ts"] + e["dur"]))
    total = sum(agg.values())
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e6:7.3f}s  {k}")
    if spans:
        spans.sort()
        busy_lo, busy_hi = spans[0][0], max(s[1] for s in spans)
        merged, cur = [], list(spans[0])
        for s in spans[1:]:
            if s[0] <= cur[1]:
                cur[1] = max(cur[1], s[1])
            else:
                merged.append(cur)
                cur = list(s)
        merged.append(cur)
        busy = sum(b - a for a, b in merged)
        span = busy_hi - busy_lo
        print(f"device busy {busy/1e6:.3f}s over span {span/1e6:.3f}s "
              f"-> idle {(span-busy)/1e6:.3f}s ({(span-busy)/span*100:.0f}%)")


if __name__ == "__main__":
    main()
