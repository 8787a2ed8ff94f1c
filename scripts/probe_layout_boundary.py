"""Probe: does a logical transpose around a Pallas custom call fold to a
bitcast when the producer conv's emitter layout matches?

Hypothesis (PERFORMANCE.md round-3): conv fusions emit {4,0,3,2,1} on
(B,D,H,W,C) tensors (physical D,H,W,B,C; batch-in-sublanes) while the
Pallas custom call pins default {4,3,2,1,0} — every boundary inserts a
~6.4 ms transpose copy.  If the kernel instead consumes a logically
(D,H,W,B,C)-shaped array, its default layout is byte-identical to the
emitter layout of the logical (B,D,H,W,C) tensor, so the wrapping
``jnp.transpose`` ops should become layout bitcasts (free).

Run on the live TPU:  python scripts/probe_layout_boundary.py
Dumps optimized HLO to /tmp/layout_probe and reports transpose/copy/
bitcast counts + timings for the two integration styles.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "tpu,cpu")
DUMP = "/tmp/layout_probe"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={DUMP}"
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, H, W = 8, 64, 64, 64
CI, CO = 256, 256


def copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] * 2.0


def pallas_scale_bdhwc(x):
    """Kernel on the logical (B,D,H,W,C) array — default layout."""
    b, d, h, w, c = x.shape
    return pl.pallas_call(
        copy_kernel,
        grid=(b, d // 4),
        in_specs=[pl.BlockSpec((1, 4, h, w, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, h, w, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(x)


def pallas_scale_dhwbc(xt):
    """Kernel on the logically transposed (D,H,W,B,C) array."""
    d, h, w, b, c = xt.shape
    return pl.pallas_call(
        copy_kernel,
        grid=(d // 4, h // 8),
        in_specs=[pl.BlockSpec((4, 8, w, b, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, 8, w, b, c), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(xt)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def f_direct(x, k1, k2):
    y = conv(x, k1)
    z = pallas_scale_bdhwc(y)
    return conv(z, k2)


def f_transposed(x, k1, k2):
    y = conv(x, k1)
    yt = jnp.transpose(y, (1, 2, 3, 0, 4))
    zt = pallas_scale_dhwbc(yt)
    z = jnp.transpose(zt, (3, 0, 1, 2, 4))
    return conv(z, k2)


def f_noop(x, k1, k2):
    y = conv(x, k1)
    return conv(y * 2.0, k2)


def timeit(f, *args, n=10):
    r = f(*args)
    jax.block_until_ready(r)
    float(r.reshape(-1)[0])  # forced readback
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    float(r.reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1e3


def analyze(name):
    import glob
    fs = sorted(glob.glob(f"{DUMP}/*{name}*after_optimizations.txt"))
    if not fs:
        return "no dump"
    txt = open(fs[-1]).read()
    tr = txt.count(" = transpose(") + sum(
        1 for line in txt.splitlines()
        if "transpose" in line and "fusion" in line and "kind=" in line)
    cp = txt.count(" copy(")
    bc = txt.count(" bitcast(")
    # count lines containing transpose as a fused op too
    fused_tr = sum(1 for line in txt.splitlines() if " transpose(" in line)
    return f"transpose-lines={fused_tr} copy={cp} bitcast={bc} file={fs[-1]}"


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, CI), jnp.bfloat16)
    k1 = jax.random.normal(key, (3, 3, 3, CI, CO), jnp.bfloat16)
    k2 = jax.random.normal(key, (3, 3, 3, CO, CO), jnp.bfloat16)

    jd = jax.jit(f_direct)
    jt = jax.jit(f_transposed)
    jn = jax.jit(f_noop)

    # correctness
    rd = jd(x, k1, k2)
    rt = jt(x, k1, k2)
    err = float(jnp.max(jnp.abs(rd.astype(jnp.float32)
                                - rt.astype(jnp.float32))))
    print("max |direct - transposed| =", err)

    td = timeit(jd, x, k1, k2)
    tt = timeit(jt, x, k1, k2)
    tn = timeit(jn, x, k1, k2)
    print(f"noop (xla only)        : {tn:8.2f} ms")
    print(f"pallas direct  (B,...) : {td:8.2f} ms  (boundary tax {td-tn:+.2f})")
    print(f"pallas transposed (D..): {tt:8.2f} ms  (boundary tax {tt-tn:+.2f})")
    print("HLO f_direct    :", analyze("f_direct"))
    print("HLO f_transposed:", analyze("f_transposed"))


if __name__ == "__main__":
    sys.exit(main())
