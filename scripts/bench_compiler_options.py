"""A/B XLA compiler options on the model step (chunk 8 x batch 8).

The conv emitter's tiling is constrained by the scoped-VMEM budget
(default 16 MB of v5e's 128 MB); other flags control fusion
aggressiveness.  Each option set compiles the same step and times a
fenced dispatch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_compiler_options.py
"""

import time

import numpy as np

OPTION_SETS = [
    ("baseline", {}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem32", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem100", {"xla_tpu_scoped_vmem_limit_kib": "102400"}),
    # finer sweep around the 32 MB winner (the engine default since the
    # first four rows were measured)
    ("vmem24", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem40", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem48", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
]

# Extended battery (run with `extended` argv): fusion/emitter/scheduler/
# autotune knobs found in the baked libtpu's flag table, each composed
# with the measured vmem32 winner.  Unknown-flag / compile failures are
# per-set non-fatal.
_V32 = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
EXTENDED_SETS = [("vmem32", dict(_V32))] + [
    (name, {**_V32, flag: val})
    for name, flag, val in [
        ("autotune_fusions", "xla_tpu_autotune_fusions", "true"),
        ("autotune_windows", "xla_tpu_autotune_windows", "true"),
        ("autotune_layouts", "xla_tpu_autotune_layouts", "true"),
        ("autotune_dots", "xla_tpu_autotune_dots", "true"),
        ("exp_fusion_cost", "xla_tpu_enable_experimental_fusion_cost_model",
         "true"),
        ("bundle_cost", "xla_tpu_use_bundle_aware_cost_model_for_fusions",
         "true"),
        ("scavenge_vmem", "xla_tpu_scavenge_vmem_for_fusions", "true"),
        ("aggr_loop_fusion", "xla_tpu_enable_aggressive_loop_fusion_layout_opt",
         "true"),
        ("multi_out_fusion", "xla_jf_enable_multi_output_fusion", "true"),
        ("adv_multi_out", "xla_jf_enable_advanced_multi_output_fusion",
         "true"),
        ("pincer_short", "xla_tpu_enable_pincer_short_fusion_emitter", "true"),
        ("bf16_slp", "xla_tpu_enable_bf16_slp_vectorizer", "true"),
        ("pipelined_unroll", "xla_tpu_enable_pipelined_loop_unrolling", "true"),
        ("lp_llo_sched", "xla_tpu_consider_lp_llo_scheduler", "true"),
        ("conv_pad_infeat", "xla_jf_conv_prefers_padding_input_feature",
         "true"),
        ("rw_as_conv", "xla_tpu_handle_reduce_window_as_convolution", "true"),
        ("accum_reassoc", "xla_jf_accumulation_reassociation", "true"),
        ("conv_vmem64", "xla_jf_conv_min_limit_vmem_mib", "64"),
    ]
]


def main():
    import jax
    import jax.numpy as jnp

    from mica_tpu.infer import engine as engine_mod
    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    # the engine now sets the vmem32 option itself; neutralize it so the
    # OUTER jit below owns the compiler options (nested options are
    # rejected by jax)
    engine_mod._heavy_compile_options = lambda: None

    rng = np.random.default_rng(0)
    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16)
    wins = jnp.asarray(rng.random((8, 8, 64, 64, 64, 1), np.float32))
    afs = jnp.asarray(
        (rng.random((8, 8, 64, 64, 64)) * 2**24).astype(np.uint32)
    )

    def fence(x):
        jax.block_until_ready(x)
        _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    # grab the raw (unjitted) step fn: rebuild via _build_model_step's
    # internals is private — instead just wrap the jitted one in a fresh
    # jit with options (jit-of-jit inlines)
    step = pred._build_model_step(True, full=False)

    import sys

    sets = EXTENDED_SETS if "extended" in sys.argv[1:] else OPTION_SETS
    for name, opts in sets:
        try:
            t0 = time.time()
            compiled = (
                jax.jit(lambda p, w, a, n: step(p, w, a, n))
                .lower(pred.params, wins, afs, 8)
                .compile(compiler_options=opts or None)
            )
            compile_s = time.time() - t0
            out = compiled(pred.params, wins, afs, 8)
            fence(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = compiled(pred.params, wins, afs, 8)
                fence(out)
                best = min(best, time.time() - t0)
            del out
            print(f"{name:10s} {best * 1e3:7.1f} ms/dispatch "
                  f"({best / 64 * 1e3:5.2f} ms/window)  "
                  f"[compile {compile_s:.0f}s]")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
