"""Self-contained end-to-end demo: synthetic map -> all-atom PDB.

The reference's sanity run (README.md:41-45 of jianlin-cheng/MICA) needs
a ~100 MB EMDB map and the Zenodo checkpoint.  This demo needs NOTHING
external: it fabricates a protein-shaped scenario (self-avoiding CA walk,
random sequence, bump-model density), writes the same input layout the
real pipeline consumes (map MRC + FASTA + AF3 structure directory +
docked model), and drives the actual `mica_tpu.cli.run` CLI — map
preprocessing, sliding-window network inference with the committed
trained fixture (tests/fixtures/mica_synth_base16.pth, a base-16 network
trained on this synthetic family by scripts/train_synth_fixture.py),
candidate extraction, sequence alignment, model assembly, gap filling,
and the native C++ all-atom rebuild.

Run (CPU works; a TPU makes the inference step fast):
    python examples/synthetic_demo.py [--out DIR] [--n_res 100]

Prints the per-stage time-cost table and the final CA-model accuracy
against the known ground-truth chain.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_inputs(out: Path, n_res: int, shape, seed: int):
    from mica_tpu.io import mrc as mrc_io
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.utils.synthetic import make_scenario

    ca, seq, vols = make_scenario(n_res=n_res, shape=shape, seed=seed)
    rng = np.random.default_rng(seed + 17)
    density = vols["backbone_probability"] + rng.normal(
        scale=0.05, size=shape
    ).astype(np.float32)

    inp = out / "input"
    inp.mkdir(parents=True, exist_ok=True)
    # MRC axis order is (z, y, x)-fastest; scenario arrays are (x, y, z)
    mrc_io.write_mrc(out / "emd_demo.mrc", np.transpose(density, (2, 1, 0)),
                     voxel_size=1.0)
    (out / "demo.fasta").write_text(f">synth|Chains A\n{seq}\n")
    af_dir = inp / "AF3_structures" / "synth"
    af_dir.mkdir(parents=True, exist_ok=True)
    pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [ca],
                        res_names_by_chain=[list(seq)])
    pdb_io.write_ca_pdb(inp / "input_af3_docked.pdb", [ca],
                        res_names_by_chain=[list(seq)])
    return ca


def ca_accuracy(model_pdb: Path, truth_ca: np.ndarray):
    """(coverage, median distance) of built CAs against the truth chain."""
    from mica_tpu.io import pdb as pdb_io

    atoms = pdb_io.parse_pdb(model_pdb)
    ca = atoms[atoms["name"] == "CA"]
    built = np.stack([ca["x"], ca["y"], ca["z"]], axis=-1)
    if len(built) == 0:
        return 0.0, float("inf")
    d = np.linalg.norm(truth_ca[:, None, :] - built[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    coverage = float((nearest < 3.0).mean())
    return coverage, float(np.median(nearest))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mica_demo")
    ap.add_argument("--n_res", type=int, default=100)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument(
        "--model_path",
        default=str(REPO / "tests" / "fixtures" / "mica_synth_base16.pth"),
        help="network checkpoint (.pth, reference format); the committed "
        "synthetic fixture by default",
    )
    ap.add_argument("--base_filters", type=int, default=16)
    args = ap.parse_args()

    if not Path(args.model_path).exists():
        sys.exit(
            f"checkpoint not found: {args.model_path}\n"
            "Generate it with scripts/train_synth_fixture.py, or pass a "
            "trained --model_path (+ --base_filters)."
        )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    shape = (args.size,) * 3
    print(f"[demo] building synthetic inputs in {out} ...")
    truth_ca = build_inputs(out, args.n_res, shape, args.seed)

    cmd = [
        sys.executable, "-m", "mica_tpu.cli.run",
        "-m", str(out / "emd_demo.mrc"),
        "-f", str(out / "demo.fasta"),
        "-i", str(out / "input"),
        "-o", str(out / "output"),
        "--model_path", args.model_path,
        "--base_filters", str(args.base_filters),
        "--run_pulchra",
    ]
    print("[demo] running:", " ".join(cmd))
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO)
    wall = time.time() - t0

    outputs = sorted((out / "output").glob("*_ca_model.pdb")) + sorted(
        (out / "output").glob("*_all_atom_model.pdb")
    )
    print(f"\n[demo] pipeline finished in {wall:.1f} s; outputs:")
    for p in outputs:
        print(f"  {p}")
    ca_models = [p for p in outputs if p.name.endswith("_ca_model.pdb")
                 and "init" not in p.name]
    if ca_models:
        cov, med = ca_accuracy(ca_models[-1], truth_ca)
        print(f"[demo] CA model vs ground truth: coverage(<3A) "
              f"{cov * 100:.0f}%, median distance {med:.2f} A")


if __name__ == "__main__":
    main()
