"""Full-pipeline integration: map file on disk -> CA model PDB.

Runs the real Solver flow (check_seq -> nn_process with a small random
network -> clustering) to validate plumbing and shapes, then re-runs the
modeling stages with synthetic perfect prediction volumes to validate the
end product against ground truth.
"""

import numpy as np
import pytest

from mica_tpu.io import mrc as mrc_io
from mica_tpu.io import pdb as pdb_io
from mica_tpu.trace.solver import ModelingConfig, Solver

from synthetic import make_scenario


def _write_inputs(tmp_path, ca, seq, density):
    (tmp_path / "input").mkdir()
    mrc_io.write_mrc(
        tmp_path / "emd_1234.mrc", np.transpose(density, (2, 1, 0)),
        voxel_size=1.0,
    )
    fasta = tmp_path / "1234.fasta"
    fasta.write_text(f">synth|Chains A\n{seq}\n")
    af_dir = tmp_path / "input" / "AF3_structures" / "synth"
    af_dir.mkdir(parents=True)
    pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [ca],
                        res_names_by_chain=[list(seq)])
    # docked model (for the encoding path)
    pdb_io.write_ca_pdb(tmp_path / "input" / "input_af3_docked.pdb", [ca],
                        res_names_by_chain=[list(seq)])


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    ca, seq, vols = make_scenario(n_res=60, shape=(64, 64, 64), seed=3)
    density = vols["backbone_probability"]  # protein-shaped density
    _write_inputs(tmp_path, ca, seq, density)

    cfg = ModelingConfig(
        map_path=str(tmp_path / "emd_1234.mrc"),
        fasta_path=str(tmp_path / "1234.fasta"),
        input_dir=str(tmp_path / "input"),
        output_path=str(tmp_path / "out"),
        protocol="AF3_struct",
        base_filters=16,
        window_core=12,
        window_halo=2,
        batch_size=4,
        run_pulchra=True,
        allow_random_weights=True,
    )
    solver = Solver(cfg)
    assert solver.check_seq() == "success"

    # real nn path: map from disk -> prepared volume -> prediction volumes
    solver.nn_process()
    shape = solver.prepared.volume.shape
    assert shape == (64, 64, 64)
    assert solver.volumes["backbone_probability"].shape == shape
    assert solver.volumes["amino_acid_probability"].shape == (20,) + shape
    assert np.isfinite(solver.volumes["backbone_probability"]).all()
    assert "getData" in solver.time_cost and "nnPred" in solver.time_cost

    # swap in perfect prediction volumes and run the modeling stages
    solver.volumes = vols
    solver._timed("clustering", solver._clustering)
    solver._timed("fragModeling", solver.frag_modeling)
    solver._timed("seqStructAlignWithAF3Structure", solver.align_af3)
    solver._timed("initialModelBuilding", solver.build_initial)
    solver._timed("gapFilling", solver.fill_gaps)
    all_atom = solver._timed("run_pulchra", solver.rebuild_all_atom)
    solver.time_record()

    model = pdb_io.parse_pdb(solver.ca_model_path)
    mca = pdb_io.select(model, name="CA")
    assert len(mca) > 0.6 * len(ca)
    d = np.linalg.norm(
        pdb_io.coords(mca)[:, None, :] - ca[None, :, :], axis=-1
    ).min(axis=1)
    assert np.median(d) < 1.5
    assert all_atom is not None and pdb_io.parse_pdb(all_atom).size > 0
