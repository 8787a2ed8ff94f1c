"""End-to-end pipeline benchmark on real hardware: map file -> all-atom PDB.

Fabricates a realistic synthetic scenario (protein-shaped density +
matching FASTA + AF3 template) at production scale, then runs the FULL
Solver twice:

  1. the nn stages (getData / nnPred) with the full-size network
     (base 64, 64-window, bf16) on the live TPU — real preprocessing +
     sliding-window inference timings;
  2. the modeling stages (clustering ... run_pulchra) on synthetic
     perfect prediction volumes — real trace-stage load at scale (random
     weights would give the trace stage nothing to chew on).

Prints the per-stage time_cost table — the same stages the reference
writes to time_cost_<map>.csv (modeler.py:2137-2143).

Run: PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/tests \
     python -u scripts/bench_e2e_pipeline.py
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
    )
    from mica_tpu.io import mrc as mrc_io
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.trace.solver import ModelingConfig, Solver
    from synthetic import make_scenario

    n_res, shape = 220, (160, 160, 160)
    ca, seq, vols = make_scenario(n_res=n_res, shape=shape, seed=7)
    density = vols["backbone_probability"]

    tmp = Path(tempfile.mkdtemp(prefix="mica_e2e_"))
    (tmp / "input").mkdir()
    mrc_io.write_mrc(tmp / "emd_9999.mrc",
                     np.transpose(density, (2, 1, 0)), voxel_size=1.0)
    (tmp / "9999.fasta").write_text(f">synth|Chains A\n{seq}\n")
    af_dir = tmp / "input" / "AF3_structures" / "synth"
    af_dir.mkdir(parents=True)
    pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [ca],
                        res_names_by_chain=[list(seq)])
    pdb_io.write_ca_pdb(tmp / "input" / "input_af3_docked.pdb", [ca],
                        res_names_by_chain=[list(seq)])

    cfg = ModelingConfig(
        map_path=str(tmp / "emd_9999.mrc"),
        fasta_path=str(tmp / "9999.fasta"),
        input_dir=str(tmp / "input"),
        output_path=str(tmp / "out"),
        protocol="AF3_struct",
        base_filters=64,          # production network
        batch_size=8,
        run_pulchra=True,
        allow_random_weights=True,
    )
    t_total = time.time()
    solver = Solver(cfg)
    assert solver.check_seq() == "success"

    # nn stages by hand: with random weights the full nn_process would
    # extract ~100k garbage candidates (4M voxels above threshold) and
    # its timing would measure junk processing, not the pipeline.  Time
    # map prep + sliding-window inference — the real device work — and
    # feed the modeling stages synthetic perfect volumes instead.
    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.infer.pipeline import build_af3_encoding, prepare_map

    t0 = time.time()
    solver.prepared = prepare_map(cfg.map_path)
    encoding = build_af3_encoding(solver.prepared, cfg.docked_model_path)
    solver.time_cost["getData"] = time.time() - t0

    import jax.numpy as jnp

    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    params = init_params_fast(
        MICA(base=cfg.base_filters),
        (jnp.zeros((1, 8, 8, 8, 1)), jnp.zeros((1, 8, 8, 8, 24))),
    )
    t0 = time.time()
    predictor = SlidingWindowPredictor(
        params, batch_size=cfg.batch_size,
        base_filters=cfg.base_filters,
    )
    out = predictor.predict_volume(solver.prepared.volume, encoding,
                                   keep_on_device=True)
    del out
    solver.time_cost["nnPred"] = time.time() - t0
    print(f"[e2e] nn stages done: volume {solver.prepared.volume.shape}",
          flush=True)

    # swap in perfect prediction volumes for a meaningful trace load
    solver.volumes = vols
    solver._timed("clustering", solver._clustering)
    solver._timed("fragModeling", solver.frag_modeling)
    solver._timed("seqStructAlignWithAF3Structure", solver.align_af3)
    solver._timed("initialModelBuilding", solver.build_initial)
    solver._timed("gapFilling", solver.fill_gaps)
    solver._timed("run_pulchra", solver.rebuild_all_atom)
    solver.time_record()
    total = time.time() - t_total

    print(f"\n[e2e] {n_res}-residue chain, {shape} map, full-size network")
    for stage, cost in solver.time_cost.items():
        print(f"  {stage:36s} {cost:8.2f} s")
    print(f"  {'TOTAL (incl. compile/setup)':36s} {total:8.2f} s")

    model = pdb_io.parse_pdb(solver.ca_model_path)
    mca = pdb_io.select(model, name="CA")
    d = np.linalg.norm(
        pdb_io.coords(mca)[:, None, :] - ca[None, :, :], axis=-1
    ).min(axis=1)
    print(f"  CA model: {len(mca)}/{n_res} residues, "
          f"median dist to truth {np.median(d):.2f} A")


if __name__ == "__main__":
    main()
