"""Candidate extraction: device pipeline vs host pipeline on the real TPU.

Measures the end-to-end trace-stage hand-off on a 256-cube synthetic
prediction volume resident in device HBM (the state the inference engine
leaves it in with keep_on_device=True):

  host path   = transfer CA+BB+AApred volumes to host, run
                candidates.extract_candidates (morphology clustering)
  device path = candidates_device.extract_candidates_device (one jitted
                program; only O(candidates) outputs transfer)

Run alone on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_extraction.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "tests")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from synthetic import make_scenario

    from mica_tpu.trace.candidates import extract_candidates
    from mica_tpu.trace.candidates_device import extract_candidates_device

    # a realistic-scale scenario: ~600 residues in a 256-cube
    print("building scenario...", flush=True)
    _, _, vols = make_scenario(n_res=600, shape=(256, 256, 256), seed=11)
    ca = jnp.asarray(vols["carbon_alpha_probability"])
    bb = jnp.asarray(vols["backbone_probability"])
    aa = jnp.asarray(vols["amino_acid_probability"])
    pred = jnp.asarray(vols["amino_acid_prediction"])
    jax.block_until_ready((ca, bb, aa, pred))

    # device path (first call compiles; second call is the measurement)
    t0 = time.time()
    d = extract_candidates_device(ca, bb, aa)
    compile_s = time.time() - t0
    t0 = time.time()
    d = extract_candidates_device(ca, bb, aa)
    dev_s = time.time() - t0
    print(f"device path: {dev_s:.2f} s ({len(d['coords'])} candidates, "
          f"first-call {compile_s:.1f} s)", flush=True)

    # host path: volume transfers + host pipeline
    t0 = time.time()
    ca_h = np.asarray(ca)
    bb_h = np.asarray(bb)
    pred_h = np.asarray(pred)
    transfer_s = time.time() - t0
    t0 = time.time()
    cands = extract_candidates(ca_h, bb_h, aa, pred_h,
                               cluster_method="morphology")
    host_s = time.time() - t0
    print(f"host path: transfers {transfer_s:.2f} s + extraction "
          f"{host_s:.2f} s = {transfer_s + host_s:.2f} s "
          f"({len(cands.coords)} candidates)")
    print(f"speedup: {(transfer_s + host_s) / dev_s:.1f}x")
    match = len(d["coords"]) == len(cands.coords) and np.allclose(
        d["coords"], cands.coords, atol=1e-9
    )
    print(f"outputs match: {match}")


if __name__ == "__main__":
    main()
