"""Dump the optimized HLO of the inference model step and summarize the
expensive fusions found by scripts/trace_step.py (convert_reduce_fusion*)
with their shapes and root ops, so the 77 ms reductions can be attributed
to source.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/dump_step_hlo.py [names...]
"""

import re
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16,
                                  chunk=1)
    step = pred._build_model_step(True)

    wins = jnp.zeros((1, 8, 64, 64, 64, 1), jnp.float32)
    afs = jnp.zeros((1, 8, 64, 64, 64), jnp.uint32)
    lower = step.lower if hasattr(step, "lower") else jax.jit(step).lower
    compiled = lower(pred.params, wins, afs, 1).compile()
    txt = compiled.as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: /tmp/step_hlo.txt ({len(txt.splitlines())} lines)")

    want = sys.argv[1:] or ["convert_reduce_fusion", "fusion.62"]
    # print each requested fusion's definition line + its computation body
    lines = txt.splitlines()
    for i, ln in enumerate(lines):
        m = re.match(r"\s*%?(\S+?) = .*fusion\(", ln)
        if not m:
            continue
        name = m.group(1)
        base = name.rstrip("0123456789.")
        if not any(w.rstrip("0123456789.") == base or w == name
                   for w in want):
            continue
        print("=" * 100)
        print(ln.strip()[:4000])


if __name__ == "__main__":
    main()
