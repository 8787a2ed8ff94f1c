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

    # parse the xplane and aggregate device op durations
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    files.sort(key=lambda f: -len(f))
    assert files, "no xplane captured"
    from tensorboard_plugin_profile.convert.raw_to_tool_data import (
        xspace_to_tool_data,
    )

    data, _ = xspace_to_tool_data([files[-1]], "framework_op_stats", {})
    import gzip
    import io
    import json

    # framework_op_stats returns json (possibly gzipped str)
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    print(data[:2000])
    sys.stdout.flush()


if __name__ == "__main__":
    main()
