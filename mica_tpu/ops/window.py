"""Volume <-> sliding-window decomposition as pure jittable functions.

The reference materializes every 64-cube window as an ``.npz`` file on disk
(create_grids.py:129-176) and stitches predictions back by pasting each
window's central 48-cube (predict.py:439-512).  Here the decomposition is a
*view*: extraction is a batched ``dynamic_slice`` over a statically computed
start lattice, and stitching is a transpose+reshape (the 48-cube cores tile
the volume exactly, so no scatter and no overlap handling is needed).

Window geometry (identical to the reference): core ``48``, halo ``8``,
window ``64``, start lattice at multiples of 48 below the original extent.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CORE = 48
HALO = 8
WINDOW = CORE + 2 * HALO  # 64


def window_starts(shape: Tuple[int, int, int], core: int = CORE) -> np.ndarray:
    """(nw, 3) int array of core start positions (multiples of ``core``)."""
    axes = [np.arange(0, s, core) for s in shape]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.reshape(-1) for g in grid], axis=-1)


def window_counts(shape: Tuple[int, int, int], core: int = CORE) -> Tuple[int, int, int]:
    return tuple(-(-s // core) for s in shape)


def core_extents(shape: Tuple[int, int, int], core: int = CORE) -> np.ndarray:
    """(nw, 3) per-window valid core sizes (min(core, shape - start))."""
    starts = window_starts(shape, core)
    return np.minimum(core, np.asarray(shape) - starts)


@partial(jax.jit, static_argnames=("core", "halo"))
def extract_windows(volume: jnp.ndarray, core: int = CORE, halo: int = HALO) -> jnp.ndarray:
    """Split ``volume[x,y,z]`` into (nw, w, w, w) overlapping windows.

    Window ``n`` covers original coordinates ``[start-halo, start-halo+w)``
    per axis, zero-padded outside the volume — byte-identical contents to
    the reference's npz grids.
    """
    window = core + 2 * halo
    shape = volume.shape
    pads = []
    for s in shape:
        n_blocks = -(-s // core)
        pad_end = (n_blocks - 1) * core + window - halo - s
        pads.append((halo, pad_end))
    padded = jnp.pad(volume, pads)

    starts = jnp.asarray(window_starts(shape, core), jnp.int32)

    def one(start):
        return jax.lax.dynamic_slice(padded, (start[0], start[1], start[2]),
                                     (window, window, window))

    return jax.vmap(one)(starts)


@partial(jax.jit, static_argnames=("shape", "core", "halo"))
def stitch_windows(
    windows: jnp.ndarray,
    shape: Tuple[int, int, int],
    core: int = CORE,
    halo: int = HALO,
) -> jnp.ndarray:
    """Reassemble a volume from per-window predictions.

    ``windows`` is (nw, w, w, w) or (nw, C, w, w, w); the halo is stripped
    and the cores (which tile the volume exactly) are reassembled with a
    transpose+reshape.  Returns (x, y, z) or (C, x, y, z).
    """
    has_channels = windows.ndim == 5
    nb = window_counts(shape, core)
    cores = windows[..., halo : halo + core, halo : halo + core, halo : halo + core]
    if has_channels:
        c = cores.shape[1]
        cores = cores.reshape(nb[0], nb[1], nb[2], c, core, core, core)
        # -> (C, bx, core, by, core, bz, core)
        cores = cores.transpose(3, 0, 4, 1, 5, 2, 6)
        full = cores.reshape(c, nb[0] * core, nb[1] * core, nb[2] * core)
        return full[:, : shape[0], : shape[1], : shape[2]]
    cores = cores.reshape(nb[0], nb[1], nb[2], core, core, core)
    cores = cores.transpose(0, 3, 1, 4, 2, 5)
    full = cores.reshape(nb[0] * core, nb[1] * core, nb[2] * core)
    return full[: shape[0], : shape[1], : shape[2]]
