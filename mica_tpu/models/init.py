"""Fast host-side parameter initialization.

``flax.Module.init`` traces and compiles an initialization program; on a
slow-compile host that costs minutes for the full network.  This module
builds the same parameter tree with numpy (xavier-normal kernels, zero
biases — matching init_weights_with_regularization in the reference,
model.py:351-360) using only ``jax.eval_shape``, so no device compilation
happens.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_params_fast(model, sample_args: Tuple, seed: int = 0):
    """Build params for ``model`` without compiling an init program.

    Non-array entries of ``sample_args`` (dropout rates, train flags) are
    bound statically — eval_shape would otherwise abstract them and break
    Python control flow on them inside the module."""
    arr_idx = [i for i, a in enumerate(sample_args) if hasattr(a, "shape")]

    def call(*abstract):
        args = list(sample_args)
        for i, a in zip(arr_idx, abstract):
            args[i] = a
        return model.init(jax.random.PRNGKey(0), *args)

    shapes = jax.eval_shape(call, *[sample_args[i] for i in arr_idx])
    shapes = shapes["params"]
    rng = np.random.default_rng(seed)

    def init_leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape = s.shape
        if name == "kernel" and len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            fan_out = int(shape[-1])
            if len(shape) > 2:
                receptive = int(np.prod(shape[:-2]))
                fan_in = shape[-2] * receptive
                fan_out = shape[-1] * receptive
            std = float(np.sqrt(2.0 / (fan_in + fan_out)))
            return jnp.asarray(
                rng.normal(0.0, std, size=shape).astype(np.float32)
            )
        if name == "weights":
            return jnp.full(shape, 1.0 / shape[0], jnp.float32)
        return jnp.zeros(shape, s.dtype)

    return jax.tree_util.tree_map_with_path(init_leaf, shapes)
