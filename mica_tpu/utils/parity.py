"""Parity metrics and reference-comparison tooling.

Supports the north-star mask-parity check (Dice >= 0.999 vs the reference
on EMD-15635, BASELINE.md): Dice coefficients between prediction volumes,
plus a harness that runs the reference PyTorch network (imported from a
reference checkout, used purely as an oracle) and the mica_tpu network on
identical windows and reports per-head agreement.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def dice(a: np.ndarray, b: np.ndarray) -> float:
    """Dice coefficient of two binary masks."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    denom = a.sum() + b.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * np.logical_and(a, b).sum() / denom)


def mask_dice_report(
    ours: Dict[str, np.ndarray],
    reference: Dict[str, np.ndarray],
    bb_threshold: float = 0.5,
    ca_threshold: float = 0.5,
) -> Dict[str, float]:
    """Dice between thresholded probability volumes + AA label agreement."""
    report = {
        "backbone_dice": dice(
            ours["backbone_probability"] >= bb_threshold,
            reference["backbone_probability"] >= bb_threshold,
        ),
        "carbon_alpha_dice": dice(
            ours["carbon_alpha_probability"] >= ca_threshold,
            reference["carbon_alpha_probability"] >= ca_threshold,
        ),
        "amino_acid_agreement": float(
            np.mean(
                ours["amino_acid_prediction"] == reference["amino_acid_prediction"]
            )
        ),
    }
    report["min_dice"] = min(report["backbone_dice"], report["carbon_alpha_dice"])
    return report


def compare_with_torch_reference(
    params,
    reference_repo: str,
    checkpoint_path: str = "",
    n_windows: int = 4,
    seed: int = 0,
    base_filters: int = 64,
) -> Dict[str, float]:
    """Run both networks on identical random windows; report max deviation.

    ``reference_repo`` is a checkout containing models/model.py; when
    ``checkpoint_path`` is given both networks load the same weights,
    otherwise the torch weights are converted to ours so outputs should
    agree to float tolerance either way.
    """
    import sys

    import torch

    if reference_repo not in sys.path:
        sys.path.insert(0, reference_repo)
    from models.model import MICA as TorchMICA  # type: ignore

    from ..models import convert
    from ..models.mica import MICA

    tm = TorchMICA(base_filters=base_filters)
    if checkpoint_path:
        ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        tm.load_state_dict(sd, strict=False)
        params = convert.torch_state_dict_to_params(sd)
    elif params is None:
        params = convert.torch_state_dict_to_params(tm.state_dict())
    tm.eval()

    rng = np.random.default_rng(seed)
    x = rng.random((n_windows, 1, 16, 16, 16), dtype=np.float32)
    af = (rng.random((n_windows, 24, 16, 16, 16)) < 0.02).astype(np.float32)

    with torch.no_grad():
        t_bb, t_ca, t_aa = tm(torch.from_numpy(x), torch.from_numpy(af))

    model = MICA(base=base_filters)
    o_bb, o_ca, o_aa = model.apply(
        {"params": params},
        np.transpose(x, (0, 2, 3, 4, 1)),
        np.transpose(af, (0, 2, 3, 4, 1)),
    )

    def dev(t, o):
        return float(np.abs(t.numpy() - np.transpose(np.asarray(o), (0, 4, 1, 2, 3))).max())

    return {
        "bb_max_dev": dev(t_bb, o_bb),
        "ca_max_dev": dev(t_ca, o_ca),
        "aa_max_dev": dev(t_aa, o_aa),
    }


def run_reference_prediction(
    reference_repo: str,
    checkpoint_path: str,
    map_path: str,
    workdir: str,
) -> Dict[str, np.ndarray]:
    """Run the reference's full preprocessing+prediction+reconstruction
    (utils/preprocessing.py:80-148 + utils/predict.py:589-634) as an oracle
    and return its four volumes.

    Requires the reference checkout's dependencies (torch; mrcfile or the
    test shim registered in sys.modules).  Used by
    scripts/fetch_and_validate.py for the real-artifact Dice check.
    """
    import sys
    from pathlib import Path

    if reference_repo not in sys.path:
        sys.path.insert(0, reference_repo)
    from utils.create_grids import GridCreator  # type: ignore
    from utils.predict import CryoEMPredictor  # type: ignore
    from utils.preprocessing import DataPreprocessor  # type: ignore

    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    norm_path = work / "resampled_normalized_map.mrc"
    pre = DataPreprocessor(str(map_path), str(work / "AF3_results"),
                           normalized_map_path=str(norm_path), quiet=True)
    pre.resample_and_normalize_map(target_voxel_size=1.0)
    if not norm_path.exists():
        raise RuntimeError("reference resample/normalize failed")

    grids_dir = work / "grids"
    GridCreator(quiet=True).create_normalized_map_grids(
        str(norm_path), str(grids_dir / "normalized_map_grids"),
        grid_size=48, padding=8,
    )
    predictor = CryoEMPredictor(
        str(checkpoint_path), str(grids_dir), str(work / "out"),
        save_output=False, device="cpu", quiet=True,
    )
    ok, volumes = predictor.run_prediction()
    if not ok:
        raise RuntimeError("reference prediction pipeline failed")
    return volumes
