"""AOT-compile the wino-VJP training step LOCALLY (v5e topology) into the
persistent compile cache, bypassing the remote tpu_compile_helper.

Round-5 state (PERFORMANCE.md): the wino custom-VJP formulation with XLA
elementwise (`MICA_TRAIN_WINO_PALLAS=1 MICA_WINO_AD_XLA_EW=1`) compiles
and wins at every module level (op grad 265.1 ms; RDB 413.8 -> 380.1 ms;
encoder stage3 858.7 -> 762.6 ms) but the FULL batch-8 step dies in the
remote compile helper — the same opaque service ceiling that rejects
batch 6/12 and every microbatch variant of the plain step.  The LOCAL
libtpu (used via jax.experimental.topologies) has no such ceiling: this
script traces the exact production step graph, compiles it locally for
the v5e target, and lets the persistent-cache write make it available to
the live process, which then only deserializes.

Trace-equivalence notes (the cached key is a hash of the traced HLO +
compile options + compiler fingerprint, so the trace here must be
byte-identical to what the live process traces):
  * gates that read ``jax.default_backend()`` are satisfied by the
    aot_validate.py monkeypatch;
  * the wino gate's auto mode reads ``jax.devices()[0].device_kind``
    (\"cpu\" here), so forced mode + ``MICA_WINO_PALLAS_MIN=32768``
    reproduces the exact auto geometry set of \"TPU v5 lite\"
    ((512,256),(256,512),(256,128),(384,128),(128,256); (64,128) is
    8192 < 32768, excluded in auto too);
  * the live run must set ``MICA_TRAIN_WINO_PALLAS=1
    MICA_WINO_AD_XLA_EW=1`` (scripts/bench_train_wino.py config 4).

Run: PYTHONPATH=/root/repo python -u scripts/aot_seed_train_step.py [cache_dir]
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MICA_TRAIN_WINO_PALLAS"] = "1"
# formulation knobs mirror the live run's (scripts/bench_train_wino.py):
#   --xla-ew  adds MICA_WINO_AD_XLA_EW=1 (XLA elementwise fwd/bwd)
#   default   full Pallas-EW AD path (aliased buffers, lowest HBM —
#             the XLA-EW variant measured 17.27 G > 15.75 G HBM in its
#             first local compile, RESOURCE_EXHAUSTED)
if "--xla-ew" in sys.argv:
    sys.argv.remove("--xla-ew")
    os.environ["MICA_WINO_AD_XLA_EW"] = "1"
if "--remat-both" in sys.argv:
    sys.argv.remove("--remat-both")
    os.environ["MICA_AOT_REMAT_SCOPE"] = "both"
os.environ["MICA_WINO_PALLAS"] = "1"
# geometry subset: --min N scopes the forced gate (production-auto set =
# 32768; 131072 = the two big stage-3 geometries only — the memory-fit
# configuration: each enabled conv site adds its xh residual to the
# step's HLO-temp peak, and the all-five set exceeds HBM by 1.53 G
# (XLA-EW) / 5.03 G (Pallas-EW) in the local v5e compile)
_min = "32768"
if "--min" in sys.argv:
    i = sys.argv.index("--min")
    _min = sys.argv[i + 1]
    del sys.argv[i:i + 2]
os.environ["MICA_WINO_PALLAS_MIN"] = _min

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.expanduser("~"), ".cache", "jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.default_backend = lambda: "tpu"  # AOT-only trace-gate bypass

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    topo = topologies.get_topology_desc("v5e:2x2")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh, P())

    trainer = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                      use_augmentation=True, remat=True,
                      remat_scope=os.environ.get("MICA_AOT_REMAT_SCOPE",
                                                 "blocks"))
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch = tuple(jnp.asarray(b) for b in synthetic_batch(batch_size=8,
                                                          size=64))
    lam = jnp.asarray(task_lambdas(0), jnp.float32)
    key = jax.random.PRNGKey(0)
    step = trainer.train_step_for_epoch(0)

    sds = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                       sharding=sh), t)

    # per-component cache-key hashes: the "computation" hash must equal
    # the live consumer's for the installed executable to be exactly the
    # program the live trace describes (the other components — backend
    # version, accelerator config — legitimately differ and are why the
    # blob is installed under the LIVE key rather than the local one)
    import logging

    logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stdout)
    h.addFilter(lambda r: "hash of serialized" in r.getMessage())
    logging.getLogger("jax._src.cache_key").addHandler(h)

    before = set(os.listdir(cache)) if os.path.isdir(cache) else set()
    print("lowering ...", flush=True)
    t0 = time.time()
    lowered = step.lower(sds(state), sds(batch), sds(lam), sds(key))
    print(f"lowered in {time.time() - t0:.1f}s; compiling (local libtpu)",
          flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    dt = time.time() - t0
    m = compiled.memory_analysis()
    peak = getattr(m, "temp_size_in_bytes", 0) / 2 ** 30
    print(f"COMPILED OK in {dt:.1f}s (peak temp HBM {peak:.2f} GB)",
          flush=True)
    after = set(os.listdir(cache)) if os.path.isdir(cache) else set()
    new = sorted(after - before)
    print(f"new cache entries ({len(new)}):")
    for e in new:
        sz = os.path.getsize(os.path.join(cache, e))
        print(f"  {e}  {sz / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
