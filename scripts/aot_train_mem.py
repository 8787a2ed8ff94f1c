"""AOT peak-HBM probe: training-step memory vs (batch, remat) on v5e.

Remat trades ~1 extra forward (~33% of the step FLOPs) for activation
memory; the batch-8 remat step measures 2.66 s on hardware.  If a
no-remat configuration fits v5e's 15.75 GB, it should win throughput
even at a smaller batch.  This compiles the step offline (topology +
libtpu, no device) and prints argument + temp HBM per configuration.

Run: python scripts/aot_train_mem.py
"""

import os
import sys

os.environ.setdefault("MICA_PALLAS_DW", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    topo = topologies.get_topology_desc("v5e:2x2")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh, P())

    def sds(t):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                           sharding=sh), t)

    lam_np = task_lambdas(0)
    # remat=True batch 8 is already known from aot_validate.py (14.76 GB
    # temp); only the no-remat feasibility question is open
    for remat in (False,):
        for batch in (4, 8):
            try:
                tr = Trainer(base_filters=64, dtype=jnp.bfloat16,
                             use_mesh=False, use_augmentation=True,
                             remat=remat)
                state = tr.init_state((1, 64, 64, 64, 1))
                b = tuple(jnp.asarray(v) for v in synthetic_batch(
                    batch_size=batch, size=64))
                lam = jnp.asarray(lam_np, jnp.float32)
                key = jax.random.PRNGKey(0)
                compiled = (jax.jit(tr.train_step_for_epoch(0))
                            .lower(sds(state), sds(b), sds(lam), sds(key))
                            .compile())
                m = compiled.memory_analysis()
                tmp = getattr(m, "temp_size_in_bytes", 0) / 2 ** 30
                arg = getattr(m, "argument_size_in_bytes", 0) / 2 ** 30
                out = getattr(m, "output_size_in_bytes", 0) / 2 ** 30
                alias = getattr(m, "alias_size_in_bytes", 0) / 2 ** 30
                total = tmp + arg + out - alias
                fits = "FITS" if total < 15.2 else "OVER"
                print(f"remat={remat!s:5s} batch={batch}: temp {tmp:6.2f} GB  "
                      f"args {arg:5.2f}  out {out:5.2f}  alias {alias:5.2f}  "
                      f"~total {total:6.2f} GB  [{fits}]", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"remat={remat!s:5s} batch={batch}: FAILED "
                      f"{type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
