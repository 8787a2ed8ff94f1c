"""Window-geometry quality study: how small can the halo go?

The engine's per-window model program is at its measured compute floor on
v5e (PERFORMANCE.md: 59.6 ms/64-cube window, 94% bf16 peak on the heavy
convs), so the only remaining map-throughput lever is TOTAL WORK: the
window lattice.  Keeping the window at 64 (the optimal compiled program)
and shrinking the halo grows the core — core 52 (halo 6) covers a
256-cube map with 125 windows instead of the reference geometry's 216
(core 48, halo 8; create_grids.py:129-176) — 0.58x the compute.

This is NOT output-exact: InstanceNorm/SE statistics are per-window, so a
different lattice produces (slightly) different predictions everywhere,
and core-edge voxels get 2 fewer voxels of receptive-field context.  The
reference's own halo (8) already truncates the network's ~23-voxel conv
receptive field, so the question is empirical: does mask quality move?

This script answers it with a TRAINED network (the synthetic fixture from
scripts/train_synth_fixture.py) on held-out synthetic scenarios with
exact ground truth:

  per geometry (core, halo):
    * Dice of predicted BB/CA masks vs rasterized ground truth
      (ops/masks.py semantics, same thresholds the modeler uses);
    * AA argmax accuracy at true CA voxels;
    * consistency vs the reference geometry's predictions (Dice of the
      binarized masks + mean |dP|);
    * windows computed / map and measured inference seconds;
    * optionally (--trace) the downstream trace stage: candidate recall
      and final CA-model coverage + median distance to truth.

Run on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/halo_geometry_study.py \
        --fixture tests/fixtures/mica_synth_base16.pth --base 16 --trace
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

GEOMETRIES = [(48, 8), (52, 6), (56, 4), (60, 2), (64, 0)]


def dice_mask(a: np.ndarray, b: np.ndarray) -> float:
    inter = float((a & b).sum())
    return 2.0 * inter / max(float(a.sum() + b.sum()), 1.0)


def build_eval_scenario(seed: int, shape, n_res: int, noise: float):
    """Held-out scenario: noisy density + truth masks + AF3 encoding."""
    from synthetic import make_scenario

    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.ops import masks as mask_ops
    from mica_tpu.ops import rasterize as rast

    ca, seq, vols = make_scenario(n_res=n_res, shape=shape, seed=seed)
    rng = np.random.default_rng(seed + 7777)
    density = vols["backbone_probability"] + rng.normal(
        scale=noise, size=shape
    ).astype(np.float32)
    density = np.clip(density, 0.0, 1.0)

    tmp = Path(tempfile.mkdtemp(prefix=f"mica_halo_{seed}_"))
    pdb_io.write_ca_pdb(tmp / "model.pdb", [ca], res_names_by_chain=[list(seq)])
    atoms = pdb_io.parse_pdb(tmp / "model.pdb")
    return {
        "ca": ca,
        "seq": seq,
        "density": density,
        "bb_truth": mask_ops.backbone_mask(atoms, shape) == 3,
        "ca_truth": mask_ops.carbon_alpha_mask(atoms, shape) == 3,
        "aa_truth": mask_ops.amino_acid_mask(atoms, shape),
        "af3": rast.rasterize_af3_encoding(atoms, shape),
        "tmp": tmp,
    }


def run_trace(scn, out, args) -> dict:
    """Drive the trace stage on the predicted volumes; CA-model quality."""
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.trace.solver import ModelingConfig, Solver

    tmp = scn["tmp"]
    (tmp / "input").mkdir(exist_ok=True)
    af_dir = tmp / "input" / "AF3_structures" / "synth"
    af_dir.mkdir(parents=True, exist_ok=True)
    pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [scn["ca"]],
                        res_names_by_chain=[list(scn["seq"])])
    (tmp / "seq.fasta").write_text(f">synth|Chains A\n{scn['seq']}\n")

    cfg = ModelingConfig(
        map_path=str(tmp / "map_unused.mrc"),
        fasta_path=str(tmp / "seq.fasta"),
        input_dir=str(tmp / "input"),
        output_path=str(tmp / f"out_{out['tag']}"),
        protocol="AF3_struct",
        base_filters=args.base,
        allow_random_weights=True,
    )
    solver = Solver(cfg)
    assert solver.check_seq() == "success"
    solver.set_volumes({k: v for k, v in out.items() if k != "tag"})
    solver._clustering()
    n_cands = len(solver.cands)
    # candidate recall: truth CAs with a candidate within 3 A
    cand_xyz = solver.cands.coords
    d_truth = np.linalg.norm(
        scn["ca"][:, None, :] - cand_xyz[None, :, :], axis=-1
    ).min(axis=1)
    recall3 = float((d_truth < 3.0).mean())

    solver.frag_modeling()
    solver.align_af3()
    solver.build_initial()
    solver.fill_gaps()
    model = pdb_io.parse_pdb(solver.ca_model_path)
    mca = pdb_io.select(model, name="CA")
    d = np.linalg.norm(
        pdb_io.coords(mca)[:, None, :] - scn["ca"][None, :, :], axis=-1
    ).min(axis=1)
    return {
        "n_candidates": n_cands,
        "cand_recall_3A": round(recall3, 4),
        "model_residues": int(len(mca)),
        "n_res": int(len(scn["ca"])),
        "median_dist_A": round(float(np.median(d)), 3),
        "mean_dist_A": round(float(np.mean(d)), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="tests/fixtures/mica_synth_base16.pth")
    ap.add_argument("--base", type=int, default=16)
    ap.add_argument("--shape", type=int, default=160)
    ap.add_argument("--n_res", type=int, default=200)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--seeds", type=int, nargs="+", default=[101, 202, 303])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace", action="store_true",
                    help="also run the trace stage per geometry")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.convert import load_torch_checkpoint

    params = load_torch_checkpoint(args.fixture)
    shape = (args.shape,) * 3

    # Mask rasterization / AF3 encoding are host-shaped ops: pin them to
    # the CPU backend (minutes-to-stalled through a tunneled TPU).
    with jax.default_device(jax.devices("cpu")[0]):
        scenarios = [
            build_eval_scenario(seed, shape, args.n_res, args.noise)
            for seed in args.seeds
        ]
    print(f"{len(scenarios)} held-out scenarios, shape {shape}, "
          f"n_res {args.n_res}, noise {args.noise}", flush=True)

    results = []
    ref_preds = {}  # seed -> (bb_mask, ca_mask, ca_prob) at reference geometry
    for core, halo in GEOMETRIES:
        pred = SlidingWindowPredictor(
            params, batch_size=args.batch, dtype=jnp.bfloat16,
            base_filters=args.base, core=core, halo=halo,
        )
        row = {"core": core, "halo": halo, "window": core + 2 * halo}
        per_scn = []
        for scn, seed in zip(scenarios, args.seeds):
            t0 = time.time()
            out = pred.predict_volume(scn["density"], scn["af3"])
            wall = time.time() - t0
            bb_m = out["backbone_probability"] > 0.5
            ca_m = out["carbon_alpha_probability"] > 0.3
            # AA accuracy at true CA voxels (mask semantics: truth labels
            # 1-20 in the 26-neighborhood of each CA; prediction argmax
            # 0-19 over the 20 AA channels)
            aa_vox = scn["aa_truth"] > 0
            aa_acc = float(
                (out["amino_acid_prediction"][aa_vox]
                 == (scn["aa_truth"][aa_vox] - 1)).mean()
            )
            m = {
                "dice_bb": dice_mask(bb_m, scn["bb_truth"]),
                "dice_ca": dice_mask(ca_m, scn["ca_truth"]),
                "aa_acc": aa_acc,
                "n_windows": int(pred.timing["n_windows"]),
                "n_computed": int(pred.timing["n_windows"]
                                  - pred.timing.get("n_empty", 0)),
                "inference_s": round(pred.timing["inference"], 3),
                "wall_s": round(wall, 3),
            }
            if (core, halo) == (48, 8):
                ref_preds[seed] = (bb_m, ca_m,
                                   out["carbon_alpha_probability"])
            else:
                rbb, rca, rprob = ref_preds[seed]
                m["dice_bb_vs_ref_geom"] = dice_mask(bb_m, rbb)
                m["dice_ca_vs_ref_geom"] = dice_mask(ca_m, rca)
                m["mean_abs_dP_ca"] = float(
                    np.abs(out["carbon_alpha_probability"] - rprob).mean()
                )
            if args.trace:
                out["tag"] = f"c{core}h{halo}_s{seed}"
                m["trace"] = run_trace(scn, out, args)
            per_scn.append(m)

        for k in ("dice_bb", "dice_ca", "aa_acc"):
            row[k] = round(float(np.mean([m[k] for m in per_scn])), 4)
        row["n_windows"] = per_scn[0]["n_windows"]
        row["inference_s"] = round(
            float(np.mean([m["inference_s"] for m in per_scn])), 3
        )
        if "dice_ca_vs_ref_geom" in per_scn[0]:
            row["dice_ca_vs_ref_geom"] = round(
                float(np.mean([m["dice_ca_vs_ref_geom"] for m in per_scn])), 4
            )
        if args.trace:
            row["cand_recall_3A"] = round(float(np.mean(
                [m["trace"]["cand_recall_3A"] for m in per_scn])), 4)
            row["median_dist_A"] = round(float(np.mean(
                [m["trace"]["median_dist_A"] for m in per_scn])), 3)
            row["model_residues"] = int(np.sum(
                [m["trace"]["model_residues"] for m in per_scn]))
        row["per_scenario"] = per_scn
        results.append(row)
        brief = {k: v for k, v in row.items() if k != "per_scenario"}
        print(json.dumps(brief), flush=True)

    print("\n=== summary ===")
    hdr = ["core", "halo", "n_windows", "inference_s", "dice_bb", "dice_ca",
           "aa_acc", "dice_ca_vs_ref_geom"]
    if args.trace:
        hdr += ["cand_recall_3A", "median_dist_A", "model_residues"]
    print("  ".join(f"{h:>18s}" for h in hdr))
    for row in results:
        print("  ".join(f"{row.get(h, ''):>18}" for h in hdr))

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
