"""Real-artifact runbook: fetch the published checkpoint + sample map and
run the north-star Dice parity check end to end (VERDICT round-1 #10).

This environment has no network egress, so the script is the one-command
path for the moment artifacts ARE reachable:

    python scripts/fetch_and_validate.py [--workdir /tmp/mica_artifacts]

Steps (each idempotent; rerun resumes):
  1. download the reference's published bundles (zenodo 15756654,
     /root/reference/README.md:27-45):
       trained_models.tar.gz  -> trained_models/MICA_best_model.pth
       input.tar.gz           -> input/15635/{emd_15635.map, 8at6.fasta, ...}
  2. convert the torch checkpoint to our parameter tree
     (mica_tpu.models.convert.load_torch_checkpoint);
  3. run our full preprocessing + sliding-window prediction on
     emd_15635.map (the reference sanity run, README.md:41-45);
  4. if a reference checkout with torch is importable, also run the
     reference's own preprocessing+prediction+reconstruction on the same
     map and emit the Dice report (mica_tpu.utils.parity.mask_dice_report)
     against the >=0.999 north-star; otherwise report our volumes' summary
     statistics and save them for offline comparison.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tarfile
import time
from pathlib import Path

ZENODO = "https://zenodo.org/records/15756654/files"
BUNDLES = {
    "trained_models.tar.gz": f"{ZENODO}/trained_models.tar.gz?download=1",
    "input.tar.gz": f"{ZENODO}/input.tar.gz?download=1",
}
CHECKPOINT = "trained_models/MICA_best_model.pth"
MAP = "input/15635/emd_15635.map"
FASTA = "input/15635/8at6.fasta"


def fetch(workdir: Path) -> bool:
    workdir.mkdir(parents=True, exist_ok=True)
    ok = True
    for name, url in BUNDLES.items():
        marker = workdir / f".extracted_{name}"
        if marker.exists():
            continue
        tgz = workdir / name
        if not tgz.exists():
            print(f"downloading {url} ...")
            try:
                subprocess.run(
                    ["curl", "-L", "--fail", "--retry", "3",
                     "--connect-timeout", "15", url, "--output", str(tgz)],
                    check=True,
                )
            except subprocess.CalledProcessError as e:
                print(f"FETCH FAILED for {name}: {e} (no network egress?)")
                ok = False
                continue
        print(f"extracting {name} ...")
        with tarfile.open(tgz) as tf:
            tf.extractall(workdir)
        marker.touch()
        tgz.unlink(missing_ok=True)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mica_artifacts")
    ap.add_argument("--reference", default="/root/reference",
                    help="reference checkout for the oracle run (optional)")
    ap.add_argument("--skip-fetch", action="store_true")
    args = ap.parse_args()
    workdir = Path(args.workdir)

    if not args.skip_fetch and not fetch(workdir):
        print("artifacts unreachable; rerun when the host has egress")
        return 2

    ckpt = workdir / CHECKPOINT
    map_path = workdir / MAP
    fasta = workdir / FASTA
    for p in (ckpt, map_path, fasta):
        if not p.exists():
            print(f"missing artifact: {p}")
            return 2

    import numpy as np

    from mica_tpu.infer.engine import SlidingWindowPredictor, auto_batch_size
    from mica_tpu.infer.pipeline import prepare_map
    from mica_tpu.models.convert import load_torch_checkpoint

    print("converting checkpoint ...")
    params = load_torch_checkpoint(str(ckpt))

    print("preprocessing map ...")
    t0 = time.time()
    prepared = prepare_map(str(map_path))
    print(f"  volume {prepared.volume.shape} in {time.time()-t0:.1f}s")

    print("predicting ...")
    pred = SlidingWindowPredictor(params, batch_size=auto_batch_size())
    ours = pred.predict_volume(prepared.volume, None)
    out_npz = workdir / "mica_tpu_volumes_15635.npz"
    np.savez_compressed(out_npz, **{k: v for k, v in ours.items()})
    print(f"  saved {out_npz} (inference {pred.timing['inference']:.1f}s)")

    # oracle comparison if the reference stack can run here
    ref_dir = Path(args.reference)
    report = None
    if (ref_dir / "utils" / "predict.py").exists():
        try:
            from mica_tpu.utils.parity import (
                mask_dice_report,
                run_reference_prediction,
            )

            theirs = run_reference_prediction(
                str(ref_dir), str(ckpt), str(map_path), str(workdir / "ref_run")
            )
            report = mask_dice_report(ours, theirs)
        except Exception as e:  # torch/deps missing — leave volumes for later
            print(f"reference oracle run unavailable: {e}")

    if report is not None:
        report["north_star_met"] = bool(report["min_dice"] >= 0.999)
        print(json.dumps(report, indent=2))
        (workdir / "dice_report.json").write_text(json.dumps(report))
        return 0 if report["north_star_met"] else 1
    stats = {
        k: dict(mean=float(np.mean(v)), max=float(np.max(v)))
        for k, v in ours.items() if v.dtype.kind == "f"
    }
    print(json.dumps({"volumes": str(out_npz), "stats": stats}, indent=2))
    print("reference oracle not runnable here; compare volumes offline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
