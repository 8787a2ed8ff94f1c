"""On-device training augmentation (matches dataset.py:8-110 distributions).

The reference augments per-sample in DataLoader worker processes with
numpy/torch RNG; here the whole augmentation suite is a pure jittable
function of a PRNG key, vmapped over the batch on device:

  gate p=0.4; Gaussian noise sigma=0.03 (p=0.7); brightness +-0.05 (p=0.5);
  contrast 0.9-1.1 (p=0.5); joint spatial block (p=0.6) of rot90 (p=0.5),
  flip (p=0.3), +-2 voxel roll per axis (p=0.4); separable 3-tap Gaussian
  blur sigma 0.5-1.0 on the density only (p=0.2).

Spatial ops are applied identically to the stacked inputs (density + 24 AF3
channels) and the three integer target masks.  Data-dependent choices
(rotation axis/count, flip axis) are expressed with ``lax.switch`` so the
whole thing stays a single compiled program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

GAUSSIAN_NOISE_STD = 0.03
BRIGHTNESS_RANGE = 0.05
CONTRAST_RANGE = (0.9, 1.1)
ROTATION_PROB = 0.5
FLIP_PROB = 0.3
TRANSLATION_PIXELS = 2
BLUR_PROB = 0.2
AUGMENT_PROB = 0.4
SPATIAL_PROB = 0.6
NOISE_PROB = 0.7
INTENSITY_PROB = 0.5
TRANSLATION_PROB = 0.4


def _rot90_variants(x: jnp.ndarray, variant: jnp.ndarray) -> jnp.ndarray:
    """lax.switch over the 9 (axis-pair, k) rot90 combos; spatial dims 1..3."""
    branches = []
    for axes in ((1, 2), (1, 3), (2, 3)):
        for k in (1, 2, 3):
            branches.append(lambda v, a=axes, kk=k: jnp.rot90(v, k=kk, axes=a))
    return jax.lax.switch(variant, branches, x)


def _flip_variants(x: jnp.ndarray, axis_idx: jnp.ndarray) -> jnp.ndarray:
    branches = [lambda v, a=a: jnp.flip(v, axis=a) for a in (1, 2, 3)]
    return jax.lax.switch(axis_idx, branches, x)


def _blur3(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable 3-tap Gaussian blur with zero padding, dims 1..3 of (C,D,H,W)."""
    offs = jnp.array([-1.0, 0.0, 1.0])
    w = jnp.exp(-0.5 * (offs / sigma) ** 2)
    w = w / jnp.sum(w)
    for dim in (1, 2, 3):
        pad = [(0, 0)] * x.ndim
        pad[dim] = (1, 1)
        xp = jnp.pad(x, pad)
        n = x.shape[dim]

        def sl(start):
            idx = [slice(None)] * x.ndim
            idx[dim] = slice(start, start + n)
            return xp[tuple(idx)]

        x = w[0] * sl(0) + w[1] * sl(1) + w[2] * sl(2)
    return x


def augment_sample(
    key: jax.Array,
    density: jnp.ndarray,  # (1, D, H, W)
    af3: jnp.ndarray,  # (24, D, H, W)
    targets: jnp.ndarray,  # (3, D, H, W) int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    keys = jax.random.split(key, 16)
    gate = jax.random.uniform(keys[0]) < AUGMENT_PROB

    def apply(args):
        density, af3, targets = args
        # noise
        do_noise = jax.random.uniform(keys[1]) < NOISE_PROB
        noise = jax.random.normal(keys[2], density.shape) * GAUSSIAN_NOISE_STD
        density = jnp.where(do_noise, density + noise, density)
        # brightness
        do_b = jax.random.uniform(keys[3]) < INTENSITY_PROB
        b = jax.random.uniform(keys[4], minval=-BRIGHTNESS_RANGE, maxval=BRIGHTNESS_RANGE)
        density = jnp.where(do_b, density + b, density)
        # contrast
        do_c = jax.random.uniform(keys[5]) < INTENSITY_PROB
        c = jax.random.uniform(keys[6], minval=CONTRAST_RANGE[0], maxval=CONTRAST_RANGE[1])
        mean = jnp.mean(density)
        density = jnp.where(do_c, (density - mean) * c + mean, density)

        # joint spatial block
        inputs = jnp.concatenate([density, af3], axis=0)  # (25, D, H, W)

        def spatial(args):
            inputs, targets = args
            do_rot = jax.random.uniform(keys[7]) < ROTATION_PROB
            variant = jax.random.randint(keys[8], (), 0, 9)
            inputs = jnp.where(do_rot, _rot90_variants(inputs, variant), inputs)
            targets = jnp.where(do_rot, _rot90_variants(targets, variant), targets)

            do_flip = jax.random.uniform(keys[9]) < FLIP_PROB
            axis_idx = jax.random.randint(keys[10], (), 0, 3)
            inputs = jnp.where(do_flip, _flip_variants(inputs, axis_idx), inputs)
            targets = jnp.where(do_flip, _flip_variants(targets, axis_idx), targets)

            do_tr = jax.random.uniform(keys[11]) < TRANSLATION_PROB
            shifts = jax.random.randint(
                keys[12], (3,), -TRANSLATION_PIXELS, TRANSLATION_PIXELS + 1
            )
            shifts = jnp.where(do_tr, shifts, jnp.zeros_like(shifts))
            for d in range(3):
                inputs = jnp.roll(inputs, shifts[d], axis=d + 1)
                targets = jnp.roll(targets, shifts[d], axis=d + 1)
            return inputs, targets

        do_spatial = jax.random.uniform(keys[13]) < SPATIAL_PROB
        inputs, targets = jax.lax.cond(
            do_spatial, spatial, lambda a: a, (inputs, targets)
        )
        density, af3 = inputs[:1], inputs[1:]

        # blur (density only)
        do_blur = jax.random.uniform(keys[14]) < BLUR_PROB
        sigma = jax.random.uniform(keys[15], minval=0.5, maxval=1.0)
        density = jnp.where(do_blur, _blur3(density, sigma), density)
        return density, af3, targets

    return jax.lax.cond(gate, apply, lambda a: a, (density, af3, targets))


def augment_batch(key: jax.Array, density, af3, targets):
    """vmapped per-sample augmentation; leading dim is the batch."""
    keys = jax.random.split(key, density.shape[0])
    return jax.vmap(augment_sample)(keys, density, af3, targets)
