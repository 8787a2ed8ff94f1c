"""AOT-validate every TPU program against a v5e topology — no device.

``jax.experimental.topologies`` + the local libtpu compiler catch what
interpret-mode tests cannot: Mosaic lowering failures, scoped-VMEM
overflows, and HBM pressure of the full graphs.  Two fatal kernel bugs
were found exactly this way (bf16 sublane rotate; a 120 MB VMEM stack).

Validates, in order:
  1. the Pallas depthwise kernels (fwd + grads) at the production widths
     (also a permanent test: tests/test_depthwise_pallas.py::test_aot_compiles_for_v5e)
  2. the full MICA forward (base 64, bf16, batch 8) with the Pallas gate ON
  3. the full training step (remat, custom VJP, batch 8) with the gate ON

Run: MICA_PALLAS_DW=1 python scripts/aot_validate.py
(the env var + backend stub force the gate on at trace time; nothing
executes — this is compile-only).
"""

import os
import sys

os.environ.setdefault("MICA_PALLAS_DW", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.default_backend = lambda: "tpu"  # trace-time gate bypass (AOT only)

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x2")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh, P())

    def report(compiled, label):
        m = compiled.memory_analysis()
        peak = getattr(m, "temp_size_in_bytes", 0) / 2 ** 30
        print(f"[aot] {label}: COMPILED OK (peak temp HBM {peak:.2f} GB)")

    # 1. kernels at production widths
    from mica_tpu.ops.depthwise_pallas import (_depthwise_conv3_grads,
                                               depthwise_conv3_pallas)

    for c in (64, 128, 256):
        x = jax.ShapeDtypeStruct((8, 64, 64, 64, c), jnp.bfloat16, sharding=sh)
        k = jax.ShapeDtypeStruct((3, 3, 3, 1, c), jnp.float32, sharding=sh)
        b = jax.ShapeDtypeStruct((c,), jnp.float32, sharding=sh)
        report(jax.jit(lambda xx, kk, bb: depthwise_conv3_pallas(
            xx, kk, bb)).lower(x, k, b).compile(), f"depthwise fwd C={c}")
        g = jax.ShapeDtypeStruct((8, 64, 64, 64, c), jnp.bfloat16, sharding=sh)
        report(jax.jit(lambda xx, gg: _depthwise_conv3_grads(
            xx, gg)).lower(x, g).compile(), f"depthwise grads C={c}")

    # 2. full model forward, gate ON
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(model, (jnp.zeros((1, 8, 8, 8, 1)),
                                      jnp.zeros((1, 8, 8, 8, 24))))
    pt = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh), params)
    x = jax.ShapeDtypeStruct((8, 64, 64, 64, 1), jnp.float32, sharding=sh)
    af = jax.ShapeDtypeStruct((8, 64, 64, 64, 24), jnp.float32, sharding=sh)
    report(jax.jit(lambda p, xx, aa: model.apply({"params": p}, xx, aa))
           .lower(pt, x, af).compile(), "MICA forward (pallas gate on)")

    # 3. full training step, gate ON
    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    tr = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                 use_augmentation=True, remat=True)
    state = tr.init_state((1, 64, 64, 64, 1))
    batch = tuple(jnp.asarray(v) for v in synthetic_batch(batch_size=8,
                                                          size=64))
    lam = jnp.asarray(task_lambdas(0), jnp.float32)
    key = jax.random.PRNGKey(0)
    sds = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                       sharding=sh), t)
    report(jax.jit(tr.train_step_for_epoch(0))
           .lower(sds(state), sds(batch), sds(lam), sds(key)).compile(),
           "train step (remat, pallas VJP)")


if __name__ == "__main__":
    main()
