"""Offline (AOT v5e topology) HLO analysis of the inference model step:
find which concatenates / copies / transposes actually materialize after
XLA optimization, to target the round-5 margin work (VERDICT r4 #2) at
boundaries that are real rather than already-fused.

Run: PYTHONPATH=/root/repo python -u scripts/analyze_step_concats.py
"""

import os
import re
import sys
from collections import defaultdict

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def nbytes(shape_str):
    m = re.match(r"(bf16|f32|f16|s32|u32|pred|s8|u8)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    sizes = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
             "s8": 1, "u8": 1}
    n = 1
    for d in [int(x) for x in m.group(2).split(",") if x]:
        n *= d
    return n * sizes[m.group(1)]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.default_backend = lambda: "tpu"  # AOT trace-gate bypass
    os.environ.setdefault("MICA_WINO_PALLAS", "1")
    os.environ.setdefault("MICA_WINO_PALLAS_MIN", "32768")

    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    topo = topologies.get_topology_desc("v5e:2x2")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh, P())

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 8, 8, 8, 1)), jnp.zeros((1, 8, 8, 8, 24))),
    )
    pt = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh), params)
    x = jax.ShapeDtypeStruct((8, 64, 64, 64, 1), jnp.float32, sharding=sh)
    af = jax.ShapeDtypeStruct((8, 64, 64, 64, 24), jnp.float32, sharding=sh)

    print("AOT compiling forward for v5e ...", flush=True)
    compiled = (jax.jit(lambda p, xx, aa: model.apply({"params": p}, xx, aa))
                .lower(pt, x, af).compile())
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines", flush=True)

    sizes = defaultdict(lambda: [0, 0])
    bigs = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(
            r"(?:ROOT )?\S+ = (\S+?)\{?[0-9,{}]*\}? "
            r"(concatenate|copy|transpose)\(", ls)
        if m:
            b = nbytes(m.group(1))
            sizes[m.group(2)][0] += 1
            sizes[m.group(2)][1] += b
            if b >= 16 << 20:
                bigs.append((b, ls[:160]))
    for op, (cnt, tot) in sorted(sizes.items()):
        print(f"{op:12s} count={cnt:4d} total={tot / 1e6:9.1f} MB")
    print("\nmaterialized ops >= 16 MB:")
    for b, l in sorted(bigs, reverse=True):
        print(f"  {b / 1e6:7.1f} MB  {l}")


if __name__ == "__main__":
    main()
