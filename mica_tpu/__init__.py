"""MICA-TPU: a TPU-native cryo-EM protein structure determination framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of MICA
(jianlin-cheng/MICA): density map + FASTA sequence + AlphaFold3 predictions
-> all-atom PDB model, built around

  * an in-memory, jit-compiled volume dataflow (no npz-grid file shuffling),
  * a multi-task 3D CNN (backbone / C-alpha / amino-acid voxel heads) in
    channels-last bfloat16 on the MXU,
  * SPMD sliding-window inference and data-parallel training over a
    ``jax.sharding.Mesh``,
  * host-side classical post-processing (clustering, graph tracing,
    sequence alignment) fed from device arrays,
  * native C++ tooling for all-atom reconstruction (PULCHRA-equivalent).

Package layout:
  io/        MRC / PDB / FASTA / mmCIF parsing and writing (self-contained)
  ops/       jittable volume ops: resample, normalize, window/stitch, rasterize
  models/    the MICA network (flax.linen) + torch checkpoint conversion
  parallel/  mesh + sharding helpers
  infer/     sliding-window inference engine
  train/     loss, augmentation, data pipeline, trainer
  trace/     post-processing modeling engine (map -> CA trace -> model)
  tools/     native tools (C++ all-atom reconstruction), PHENIX wrappers
  cli/       command-line entry points
"""

__version__ = "0.1.0"
