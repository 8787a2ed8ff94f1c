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
     python -u scripts/bench_e2e_pipeline.py [--multichain]

--multichain (VERDICT r4 #6): the 4-chain / 820-residue assembler-stress
scenario (tests/test_assemble_scale.py geometry — one sequence with two
translated/rotated chain copies per entry, jittered AF3 templates with a
displaced 20-residue segment) run map -> all-atom PDB on the hardware,
with per-stage wall-clock and the same quality gates as the CPU stress
test.
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def build_multichain_scenario(tmp: Path):
    """The test_assemble_scale geometry, materialized as on-disk inputs."""
    from mica_tpu.io import mrc as mrc_io
    from mica_tpu.io import pdb as pdb_io
    from synthetic import AA_LETTERS, make_chain, make_multichain_volumes

    shape = (160, 160, 96)
    n1, n2 = 250, 160
    rng = np.random.default_rng(5)
    seq1 = "".join(rng.choice(list(AA_LETTERS), size=n1))
    seq2 = "".join(rng.choice(list(AA_LETTERS), size=n2))
    ca1a = make_chain(n1, (80, 80, 96), seed=41)
    ca1b = ca1a + np.array([76.0, 0.0, 0.0])
    base2 = make_chain(n2, (80, 80, 96), seed=43)
    ca2c = base2 + np.array([0.0, 76.0, 0.0])
    ca2d = np.stack([base2[:, 1], 80.0 - base2[:, 0], base2[:, 2]],
                    axis=1) + np.array([76.0, 76.0, 0.0])
    chains = [(seq1, ca1a), (seq1, ca1b), (seq2, ca2c), (seq2, ca2d)]
    vols = make_multichain_volumes(chains, shape)

    (tmp / "input").mkdir()
    mrc_io.write_mrc(tmp / "emd_9999.mrc",
                     np.transpose(vols["backbone_probability"], (2, 1, 0)),
                     voxel_size=1.0)
    (tmp / "9999.fasta").write_text(
        f">synth1|Chains A, B\n{seq1}\n>synth2|Chains C, D\n{seq2}\n")
    # jittered AF3 templates with a displaced segment, rigidly shifted
    # (test_assemble_scale._entries semantics)
    t_rng = np.random.default_rng(9)
    t1 = ca1a + t_rng.normal(scale=0.6, size=(n1, 3))
    t1[100:120] += np.array([12.0, -8.0, 5.0])
    t1 += np.array([200.0, -50.0, 30.0])
    t2 = ca2c + t_rng.normal(scale=0.6, size=(n2, 3))
    t2[40:60] += np.array([-10.0, 9.0, 6.0])
    t2 += np.array([-80.0, 120.0, -40.0])
    for name, seq, t in (("synth1", seq1, t1), ("synth2", seq2, t2)):
        af_dir = tmp / "input" / "AF3_structures" / name
        af_dir.mkdir(parents=True)
        pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [t],
                            res_names_by_chain=[list(seq)])
    pdb_io.write_ca_pdb(
        tmp / "input" / "input_af3_docked.pdb",
        [c for _s, c in chains],
        res_names_by_chain=[list(s) for s, _c in chains])
    truth = {"A": ca1a, "B": ca1b, "C": ca2c, "D": ca2d}
    return vols, truth, {"synth1": ("A", "B"), "synth2": ("C", "D")}


def main():
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
    )
    from mica_tpu.io import mrc as mrc_io
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.trace.solver import ModelingConfig, Solver

    multichain = "--multichain" in sys.argv
    tmp = Path(tempfile.mkdtemp(prefix="mica_e2e_"))
    if multichain:
        vols, truth, entry_chains = build_multichain_scenario(tmp)
        n_res = sum(len(t) for t in truth.values())
        shape = vols["backbone_probability"].shape
        label = f"4-chain/{n_res}-residue"
    else:
        from synthetic import make_scenario

        n_res, shape = 220, (160, 160, 160)
        ca, seq, vols = make_scenario(n_res=n_res, shape=shape, seed=7)
        density = vols["backbone_probability"]

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
        label = f"{n_res}-residue chain"

    cfg = ModelingConfig(
        map_path=str(tmp / "emd_9999.mrc"),
        fasta_path=str(tmp / "9999.fasta"),
        input_dir=str(tmp / "input"),
        output_path=str(tmp / "out"),
        protocol="AF3_struct",
        # production network; MICA_E2E_BASE=16 for CPU smoke runs
        base_filters=int(os.environ.get("MICA_E2E_BASE", "64")),
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

    print(f"\n[e2e] {label}, {shape} map, full-size network")
    trace_s = sum(c for s, c in solver.time_cost.items()
                  if s not in ("getData", "nnPred"))
    for stage, cost in solver.time_cost.items():
        print(f"  {stage:36s} {cost:8.2f} s")
    print(f"  {'TOTAL (incl. compile/setup)':36s} {total:8.2f} s")
    print(f"  trace-stage share of total: {trace_s / total:.1%} "
          f"({trace_s:.2f} s)")

    model = pdb_io.parse_pdb(solver.ca_model_path)
    mca = pdb_io.select(model, name="CA")
    if multichain:
        # per-chain quality gates (test_assemble_scale semantics: chain
        # copies are interchangeable, so score against the nearest copy
        # of the right entry)
        aa_path = solver.ca_model_path.replace("_ca_model.pdb",
                                               "_all_atom_model.pdb")
        allatom = pdb_io.parse_pdb(aa_path) if Path(aa_path).exists() \
            else None
        for name, cids in entry_chains.items():
            copies = [truth[c] for c in cids]
            for cid in cids:
                m = mca["chain"] == cid
                got = pdb_io.coords(mca[m])
                rid = mca["res_id"][m].astype(int)
                if not len(got):
                    print(f"  chain {cid}: EMPTY")
                    continue
                errs = [min(np.linalg.norm(c[r - 1] - xyz) for c in copies)
                        for r, xyz in zip(rid, got)
                        if 1 <= r <= len(copies[0])]
                cov = len(got) / len(copies[0])
                print(f"  chain {cid} ({name}): coverage {cov:.3f}, "
                      f"median CA err {np.median(errs):.2f} A")
        if allatom is not None:
            n_sc = int(np.sum(~np.isin(allatom["name"],
                                       ["N", "CA", "C", "O"])))
            print(f"  all-atom model: {len(allatom)} atoms "
                  f"({n_sc} side-chain/CB)")
    else:
        d = np.linalg.norm(
            pdb_io.coords(mca)[:, None, :] - ca[None, :, :], axis=-1
        ).min(axis=1)
        print(f"  CA model: {len(mca)}/{n_res} residues, "
              f"median dist to truth {np.median(d):.2f} A")


if __name__ == "__main__":
    main()
