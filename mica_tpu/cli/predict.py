"""Standalone prediction CLI: map -> BB/CA/AA probability volumes (MRC).

Counterpart of running utils/predict.py directly in the reference: reads a
density map (and optional docked AF3 model), runs the sliding-window
predictor and writes the four prediction volumes as MRC files.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    p = argparse.ArgumentParser(description="MICA-TPU sliding-window prediction")
    p.add_argument("-m", "--map_path", required=True, nargs="+",
                   help="one or more density maps; with several, the "
                        "compiled predictor is reused across maps (the "
                        "heavy XLA compile is map-size independent) and "
                        "each map's volumes land in "
                        "<output_path>/<map_stem>/")
    p.add_argument("-o", "--output_path", required=True)
    p.add_argument("--docked_model", default="",
                   help="docked AF3 model (single-map mode only)")
    p.add_argument("--model_checkpoint", default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--base_filters", type=int, default=64,
                   help="network width (reference MICA: 64)")
    p.add_argument("--window_core", type=int, default=48,
                   help="sliding-window core (reference: 48); 0 = auto")
    p.add_argument("--float32", action="store_true",
                   help="run the network in float32 instead of bfloat16")
    p.add_argument("--npz_dir", default="",
                   help="also write per-grid prediction .npz artifacts in "
                        "the reference's exact layout (predict.py:353-371)")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..infer.pipeline import predict_map
    from ..io import mrc as mrc_io
    from .run import load_network_params

    params = load_network_params(args.model_checkpoint)
    if params is None:
        from ..models.init import init_params_fast
        from ..models.mica import MICA

        logging.warning("no checkpoint given; using random weights")
        model = MICA(base=args.base_filters)
        params = init_params_fast(
            model,
            (jnp.zeros((1, 8, 8, 8, 1)), jnp.zeros((1, 8, 8, 8, 24))),
        )

    maps = list(args.map_path)
    if len(maps) > 1 and args.docked_model:
        p.error("--docked_model applies to a single map; run maps with "
                "docked models individually")
    if len(maps) > 1 and args.npz_dir:
        p.error("--npz_dir with multiple maps would interleave their "
                "per-grid artifacts in one directory; run them "
                "individually")

    predictor = None
    for map_path in maps:
        out = predict_map(
            map_path, params,
            docked_pdb_path=args.docked_model or None,
            batch_size=args.batch_size,
            base_filters=args.base_filters,
            core=args.window_core,
            dtype=jnp.float32 if args.float32 else jnp.bfloat16,
            dump_windows_dir=args.npz_dir or None,
            dump_format="reference" if args.npz_dir else "compact",
            predictor=predictor,
        )
        predictor = out["predictor"]  # reuse compiled programs across maps
        prepared = out["prepared_map"]
        outdir = Path(args.output_path)
        if len(maps) > 1:
            outdir = outdir / Path(map_path).stem
        outdir.mkdir(parents=True, exist_ok=True)
        for key in ("backbone_probability", "carbon_alpha_probability",
                    "amino_acid_prediction"):
            vol = np.asarray(out[key], np.float32)
            mrc_io.write_mrc(
                outdir / f"{key}.mrc", np.transpose(vol, (2, 1, 0)),
                voxel_size=prepared.voxel_size, origin=tuple(prepared.origin),
                nstart=tuple(int(v) for v in prepared.offset),
            )
        np.savez_compressed(
            outdir / "amino_acid_probability.npz",
            data=out["amino_acid_probability"].astype(np.float16),
        )
        logging.info("%s timing: %s", Path(map_path).name, out["timing"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
