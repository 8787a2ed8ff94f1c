"""Training-data generation CLI.

Replaces the reference's 10-step shell pipeline
(create_training_data.sh:48-59 over scripts_for_training_data/*.py): for
each (map, model) pair it resamples+normalizes the map, rasterizes the
BB/CA/AA label masks and the 24-channel AF3 encoding, windows everything
and keeps windows with density max >= 0.01 — one command, one packed
array file per map.

  python -m mica_tpu.cli.makedata \\
      --pairs data/pairs.csv --output Training_Dataset/packed

``pairs.csv`` rows: map_path,model_pdb_path[,docked_af3_pdb_path]
Single pair mode: --map ... --model ... [--docked ...]
"""

from __future__ import annotations

import argparse
import csv
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    p = argparse.ArgumentParser(description="Generate MICA training windows")
    p.add_argument("--pairs", help="CSV of map_path,model_pdb[,docked_af3_pdb]")
    p.add_argument("--map", dest="map_path")
    p.add_argument("--model", dest="model_path")
    p.add_argument("--docked", dest="docked_path", default="")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--density_threshold", type=float, default=0.01)
    args = p.parse_args(argv)

    from ..train.data import build_training_grids

    pairs = []
    if args.pairs:
        with open(args.pairs) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                pairs.append((row[0], row[1], row[2] if len(row) > 2 else None))
    if args.map_path and args.model_path:
        pairs.append((args.map_path, args.model_path, args.docked_path or None))
    if not pairs:
        logger.error("no input pairs given")
        return 1

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    total = 0
    for map_path, model_path, docked in pairs:
        name = Path(map_path).stem
        try:
            ds = build_training_grids(
                map_path, model_path, docked,
                density_threshold=args.density_threshold,
            )
        except Exception as e:
            logger.error("failed on %s: %s", name, e)
            continue
        dest = out / f"{name}.npz"
        ds.save(dest)
        total += len(ds)
        logger.info("%s: %d windows -> %s", name, len(ds), dest)
    logger.info("done: %d windows total", total)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
